# GHM-C / GHM-R RetinaNet (reference configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(bbox_head=dict(
    loss_cls=dict(type='GHMC', bins=30, momentum=0.75, loss_weight=1.0),
    loss_bbox=dict(type='GHMR', mu=0.02, bins=10, loss_weight=10.0)))
