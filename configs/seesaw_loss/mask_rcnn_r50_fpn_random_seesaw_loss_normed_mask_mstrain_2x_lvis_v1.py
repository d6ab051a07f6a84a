# Variant parity: reference configs/seesaw_loss/mask_rcnn_r50_fpn_random_seesaw_loss_normed_mask_mstrain_2x_lvis_v1.py
_base_ = ['mask_rcnn_r50_fpn_sample1e-3_seesaw_loss_mstrain_2x_lvis_v1.py']
model = dict(mask_head=dict(predictor_cfg=dict(type='NormedConv2d', tempearture=20)))
data = dict(train=dict(
    _delete_=True, type='LVISV1Dataset',
    ann_file='data/lvis_v1/annotations/lvis_v1_train.json',
    img_prefix='data/lvis_v1/'))
