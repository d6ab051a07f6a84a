# Variant parity: reference configs/detectors/cascade_rcnn_r50_sac_1x_coco.py
_base_ = ['../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(
    _delete_=True, type='DetectoRSResNet', depth=50,
    out_indices=(0, 1, 2, 3), sac_stages=(1, 2, 3)))
