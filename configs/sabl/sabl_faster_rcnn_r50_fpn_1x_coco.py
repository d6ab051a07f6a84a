# SABL Faster R-CNN (reference configs/sabl/sabl_faster_rcnn_r50_fpn_1x_coco.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    bbox_head=dict(_delete_=True, type='SABLHead', num_classes=80,
                   in_channels=256, roi_size=7, cls_out_channels=1024,
                   num_buckets=14, scale_factor=1.7))
