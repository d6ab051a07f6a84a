# Variant parity: reference configs/vfnet/vfnet_x101_32x4d_fpn_mdconv_c3-c5_mstrain_2x_coco.py
_base_ = ['vfnet_x101_32x4d_fpn_mstrain_2x_coco.py']
model = dict(backbone=dict(dcn=dict(type='DCNv2'),
                           stage_with_dcn=(False, True, True, True)),
             bbox_head=dict(dcn_on_last_conv=True))
