# Variant parity: reference configs/seesaw_loss/cascade_mask_rcnn_r101_fpn_random_seesaw_loss_normed_mask_mstrain_2x_lvis_v1.py
_base_ = ['../lvis/mask_rcnn_r50_fpn_sample1e-3_mstrain_1x_lvis_v1.py']
model = dict(
    _delete_=True,
    type='CascadeRCNN',
    backbone=dict(type='ResNet', depth=101, out_indices=(0, 1, 2, 3),
                  frozen_stages=1, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, num_outs=5),
    rpn_head=dict(type='RPNHead', in_channels=256, feat_channels=256,
                  strides=[4, 8, 16, 32, 64]),
    bbox_heads=[
        dict(type='Shared2FCBBoxHead', num_classes=1203, in_channels=256,
             roi_size=7, fc_channels=1024, target_stds=[0.1, 0.1, 0.2, 0.2],
             loss_cls=dict(type='SeesawLoss', p=0.8, q=2.0, loss_weight=1.0)),
        dict(type='Shared2FCBBoxHead', num_classes=1203, in_channels=256,
             roi_size=7, fc_channels=1024,
             target_stds=[0.05, 0.05, 0.1, 0.1], loss_cls=dict(type='SeesawLoss', p=0.8, q=2.0, loss_weight=1.0)),
        dict(type='Shared2FCBBoxHead', num_classes=1203, in_channels=256,
             roi_size=7, fc_channels=1024,
             target_stds=[0.033, 0.033, 0.067, 0.067], loss_cls=dict(type='SeesawLoss', p=0.8, q=2.0, loss_weight=1.0)),
    ],
    mask_head=dict(type='FCNMaskHead', num_classes=1203, in_channels=256,
                   conv_out_channels=256, num_convs=4, roi_size=14,
                   predictor_cfg=dict(type='NormedConv2d', tempearture=20)),
    test_cfg=dict(rcnn=dict(score_thr=0.0001, nms=dict(iou_threshold=0.5),
                            max_per_img=300, mask_thr_binary=0.5)))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
data = dict(train=dict(
    _delete_=True, type='LVISV1Dataset',
    ann_file='data/lvis_v1/annotations/lvis_v1_train.json',
    img_prefix='data/lvis_v1/'))
