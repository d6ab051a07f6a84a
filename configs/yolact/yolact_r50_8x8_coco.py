# Variant parity: reference configs/yolact/yolact_r50_8x8_coco.py
_base_ = ['yolact_r50_1x8_coco.py']
data = dict(samples_per_gpu=8)
optimizer = dict(type='SGD', lr=8e-3, momentum=0.9, weight_decay=5e-4)
lr_config = dict(warmup_iters=1000, step=[20, 42, 49, 52])
