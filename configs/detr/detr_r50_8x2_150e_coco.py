# DETR R-50 (reference configs/detr/detr_r50_8x2_150e_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    _delete_=True,
    type='DETR',
    backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                  frozen_stages=1, style='pytorch'),
    bbox_head=dict(type='DETRHead', num_classes=80, in_channels=2048,
                   embed_dims=256, num_query=100, num_encoder_layers=6,
                   num_decoder_layers=6),
    test_cfg=dict(score_thr=0.05, max_per_img=100))
