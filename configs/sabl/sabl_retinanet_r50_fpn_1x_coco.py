# SABL RetinaNet (reference configs/sabl/sabl_retinanet_r50_fpn_1x_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    bbox_head=dict(
        _delete_=True,
        type='SABLRetinaHead',
        num_classes=80,
        in_channels=256,
        feat_channels=256,
        stacked_convs=4,
        approx_anchor_generator=dict(octave_base_scale=4,
                                     scales_per_octave=3,
                                     ratios=[0.5, 1.0, 2.0],
                                     strides=[8, 16, 32, 64, 128]),
        square_anchor_generator=dict(ratios=[1.0], scales=[4],
                                     strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(type='BucketingBBoxCoder', num_buckets=14,
                        scale_factor=3.0)))
