# 28-epoch HTC-W40 (reference configs/hrnet/htc_hrnetv2p_w40_28e_coco.py)
_base_ = ['htc_hrnetv2p_w40_20e_coco.py']
lr_config = dict(step=[24, 27])
runner = dict(max_epochs=28)
