# Faster R-CNN C4 (reference configs/faster_rcnn/faster_rcnn_r50_caffe_c4_1x_coco.py):
# single C4 level, res5 shared head, avg-pool bbox head
_base_ = ['./faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    type='FasterRCNNC4',
    backbone=dict(_delete_=True, type='ResNet', depth=50, style='caffe',
                  out_indices=(2,)),
    neck=dict(_delete_=True, type='IdentityNeck'),
    rpn_head=dict(_delete_=True, type='RPNHead', in_channels=1024,
                  feat_channels=1024, strides=[16]),
    shared_head=dict(type='ResLayerSharedHead', depth=50, stage=3,
                     style='caffe'),
    bbox_head=dict(_delete_=True, type='BBoxHeadAvgPool', num_classes=80,
                   in_channels=1024, roi_size=14))
