# RegNetX-800MF RetinaNet (reference configs/regnet/retinanet_regnetx-800MF_fpn_1x_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    backbone=dict(_delete_=True, type='RegNet', arch='regnetx_800mf',
                  out_indices=(0, 1, 2, 3)),
    neck=dict(in_channels=[64, 128, 288, 672]))
optimizer = dict(weight_decay=0.00005)
img_norm_cfg = dict(mean=[103.53, 116.28, 123.675],
                    std=[57.375, 57.12, 58.395], to_rgb=False)
