# Variant parity: reference configs/selfsup_pretrain/mask_rcnn_r50_fpn_swav-pretrain_1x_coco.py
_base_ = ['mask_rcnn_r50_fpn_mocov2-pretrain_1x_coco.py']
model = dict(backbone=dict(pretrained='swav_mmdet.pth'))
