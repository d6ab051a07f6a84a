# Variant parity: reference configs/htc/htc_without_semantic_r50_fpn_1x_coco.py
_base_ = ['htc_r50_fpn_1x_coco.py']
model = dict(semantic_head=None)
