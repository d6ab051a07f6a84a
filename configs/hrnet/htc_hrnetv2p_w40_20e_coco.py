# HRNetV2p-W40 htc (reference configs/hrnet/htc_hrnetv2p_w40_20e_coco.py)
_base_ = ['htc_hrnetv2p_w32_20e_coco.py']
model = dict(
    backbone=dict(extra=dict(
        stage2=dict(num_channels=(40, 80)),
        stage3=dict(num_channels=(40, 80, 160)),
        stage4=dict(num_channels=(40, 80, 160, 320)))),
    neck=dict(in_channels=[40, 80, 160, 320]))
