# FreeAnchor RetinaNet R-50 (reference configs/free_anchor/retinanet_free_anchor_r50_fpn_1x_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    bbox_head=dict(
        _delete_=True, type='FreeAnchorRetinaHead', num_classes=80,
        in_channels=256, feat_channels=256, stacked_convs=4,
        strides=[8, 16, 32, 64, 128], octave_base_scale=4,
        scales_per_octave=3, pre_anchor_topk=50, bbox_thr=0.6))
