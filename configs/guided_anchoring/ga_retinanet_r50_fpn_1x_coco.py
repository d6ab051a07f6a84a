# GA-RetinaNet (reference configs/guided_anchoring/ga_retinanet_r50_fpn_1x_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    bbox_head=dict(
        _delete_=True,
        type='GARetinaHead',
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
        anchor_coder=dict(type='DeltaXYWHBBoxCoder',
                          target_means=[0.0, 0.0, 0.0, 0.0],
                          target_stds=[1.0, 1.0, 1.0, 1.0]),
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_means=[0.0, 0.0, 0.0, 0.0],
                        target_stds=[0.07, 0.07, 0.11, 0.11]),
        loc_filter_thr=0.01))
