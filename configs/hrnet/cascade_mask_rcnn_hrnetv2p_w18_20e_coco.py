# HRNetV2p-W18 cascade_mask_rcnn (reference configs/hrnet/cascade_mask_rcnn_hrnetv2p_w18_20e_coco.py)
_base_ = ['cascade_mask_rcnn_hrnetv2p_w32_20e_coco.py']
model = dict(
    backbone=dict(extra=dict(
        stage2=dict(num_channels=(18, 36)),
        stage3=dict(num_channels=(18, 36, 72)),
        stage4=dict(num_channels=(18, 36, 72, 144)))),
    neck=dict(in_channels=[18, 36, 72, 144]))
