# Variant parity: reference configs/sabl/sabl_cascade_rcnn_r50_fpn_1x_coco.py
# (per-stage BucketingBBoxCoder scale_factor ladder 1.7/1.5/1.3)
_base_ = ['../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py']
model = dict(bbox_heads=[
    dict(type='SABLHead', num_classes=80, in_channels=256, roi_size=7,
         cls_out_channels=1024, num_buckets=14, scale_factor=1.7),
    dict(type='SABLHead', num_classes=80, in_channels=256, roi_size=7,
         cls_out_channels=1024, num_buckets=14, scale_factor=1.5),
    dict(type='SABLHead', num_classes=80, in_channels=256, roi_size=7,
         cls_out_channels=1024, num_buckets=14, scale_factor=1.3),
])
