# Variant parity: reference configs/seesaw_loss/mask_rcnn_r101_fpn_random_seesaw_loss_mstrain_2x_lvis_v1.py
_base_ = ['mask_rcnn_r50_fpn_sample1e-3_seesaw_loss_mstrain_2x_lvis_v1.py']
model = dict(backbone=dict(depth=101))
data = dict(train=dict(
    _delete_=True, type='LVISV1Dataset',
    ann_file='data/lvis_v1/annotations/lvis_v1_train.json',
    img_prefix='data/lvis_v1/'))
