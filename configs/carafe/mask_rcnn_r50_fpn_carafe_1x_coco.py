# Variant parity: reference configs/carafe/mask_rcnn_r50_fpn_carafe_1x_coco.py
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(
    neck=dict(_delete_=True, type='FPN_CARAFE',
              in_channels=[256, 512, 1024, 2048], out_channels=256,
              num_outs=5))
