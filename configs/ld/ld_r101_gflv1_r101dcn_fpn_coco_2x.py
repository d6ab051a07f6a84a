# Variant parity: reference configs/ld/ld_r101_gflv1_r101dcn_fpn_coco_2x.py
_base_ = ['ld_r18_gflv1_r101_fpn_coco_1x.py']
model = dict(
    backbone=dict(depth=101),
    neck=dict(in_channels=[256, 512, 1024, 2048]),
    teacher_config=dict(backbone=dict(
        dcn=dict(type='DCN'),
        stage_with_dcn=(False, True, True, True))),
)
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
