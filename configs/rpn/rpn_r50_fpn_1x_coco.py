# Standalone RPN (reference configs/rpn/rpn_r50_fpn_1x_coco.py): proposals as detections
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(type='RPN', bbox_head=None)
