# Variant parity: reference configs/guided_anchoring/ga_rpn_r50_fpn_1x_coco.py
_base_ = ['../rpn/rpn_r50_fpn_1x_coco.py']
model = dict(
    rpn_head=dict(
        _delete_=True,
        type='GARPNHead',
        in_channels=256,
        feat_channels=256,
        strides=[4, 8, 16, 32, 64],
        octave_base_scale=8,
        approx_anchor_generator=dict(octave_base_scale=8,
                                     scales_per_octave=3,
                                     ratios=[0.5, 1.0, 2.0],
                                     strides=[4, 8, 16, 32, 64]),
        square_anchor_generator=dict(ratios=[1.0], scales=[8],
                                     strides=[4, 8, 16, 32, 64])))
