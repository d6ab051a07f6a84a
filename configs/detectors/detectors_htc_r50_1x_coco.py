# Variant parity: reference configs/detectors/detectors_htc_r50_1x_coco.py
_base_ = ['../htc/htc_r50_fpn_1x_coco.py']
model = dict(
    type='DetectoRS',
    backbone=dict(_delete_=True, type='DetectoRSResNet', depth=50,
                  out_indices=(0, 1, 2, 3), rfp_inplanes=256, sac_stages=(1, 2, 3)),
    neck=dict(_delete_=True, type='RFP',
              in_channels=[256, 512, 1024, 2048], out_channels=256,
              num_outs=5, rfp_steps=2, aspp_out_channels=64,
              rfp_backbone=dict(type='DetectoRSResNet', depth=50,
                                out_indices=(0, 1, 2, 3),
                                rfp_inplanes=256, sac_stages=(1, 2, 3))))
