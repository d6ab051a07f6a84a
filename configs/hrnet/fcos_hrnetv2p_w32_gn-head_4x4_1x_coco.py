# FCOS HRNetV2p-W32 (reference configs/hrnet/fcos_hrnetv2p_w32_gn-head_4x4_1x_coco.py)
_base_ = ['fcos_hrnetv2p_w18_gn-head_4x4_1x_coco.py']
model = dict(
    backbone=dict(extra=dict(
        stage2=dict(num_channels=(32, 64)),
        stage3=dict(num_channels=(32, 64, 128)),
        stage4=dict(num_channels=(32, 64, 128, 256)))),
    neck=dict(in_channels=[32, 64, 128, 256]))
data = dict(samples_per_gpu=4)
