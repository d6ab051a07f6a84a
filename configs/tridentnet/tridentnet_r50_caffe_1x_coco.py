# TridentNet (reference configs/tridentnet/tridentnet_r50_caffe_1x_coco.py;
# FPN-style neck wiring — see TridentFasterRCNN docstring)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    type='TridentFasterRCNN',
    backbone=dict(_delete_=True, type='TridentResNet', depth=50,
                  num_branch=3, test_branch_idx=1),
    neck=dict(_delete_=True, type='ChannelMapper', in_channels=[1024],
              out_channels=256, num_outs=5),
    rpn_head=dict(strides=[16, 32, 64, 128, 256]))
