# Fast R-CNN on precomputed proposals (reference configs/fast_rcnn/fast_rcnn_r50_fpn_1x_coco.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(type='FastRCNN', rpn_head=None)
