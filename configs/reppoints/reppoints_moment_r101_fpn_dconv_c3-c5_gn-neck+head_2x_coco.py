# Variant parity: reference configs/reppoints/reppoints_moment_r101_fpn_dconv_c3-c5_gn-neck+head_2x_coco.py
_base_ = ['reppoints_moment_r50_fpn_1x_coco.py']
model = dict(backbone=dict(depth=101, dcn=dict(type='DCN'), stage_with_dcn=(False, True, True, True)))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
