# Deformable DETR
# (reference configs/deformable_detr/deformable_detr_r50_16x2_50e_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    _delete_=True,
    type='DeformableDETR',
    backbone=dict(type='ResNet', depth=50, out_indices=(1, 2, 3)),
    neck=dict(type='ChannelMapper', in_channels=[512, 1024, 2048],
              out_channels=256, num_outs=4),
    bbox_head=dict(type='DeformableDETRHead', num_classes=80,
                   embed_dims=256, num_query=300, num_levels=4,
                   num_points=4, num_encoder_layers=6,
                   num_decoder_layers=6, ffn_dim=1024),
    test_cfg=dict(max_per_img=100, score_thr=0.0))
