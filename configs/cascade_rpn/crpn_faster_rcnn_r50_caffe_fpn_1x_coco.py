# Cascade RPN Faster R-CNN (reference configs/cascade_rpn/crpn_faster_rcnn_r50_caffe_fpn_1x_coco.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    rpn_head=dict(_delete_=True, type='CascadeRPNHead', in_channels=256,
                  feat_channels=256, strides=[4, 8, 16, 32, 64],
                  anchor_scale=8.0))
