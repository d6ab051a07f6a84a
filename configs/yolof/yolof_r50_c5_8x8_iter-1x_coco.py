# Variant parity: reference configs/yolof/yolof_r50_c5_8x8_iter-1x_coco.py
_base_ = ['yolof_r50_c5_8x8_1x_coco.py']
runner = dict(_delete_=True, type='IterBasedRunner', max_iters=22500)
lr_config = dict(step=[15000, 20000])
