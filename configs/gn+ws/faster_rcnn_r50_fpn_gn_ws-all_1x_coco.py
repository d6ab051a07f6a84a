# Weight-standardized convs + GroupNorm everywhere (reference
# configs/gn+ws/faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
conv_cfg = dict(type='ConvWS')
norm_cfg = dict(type='GN', num_groups=32)
model = dict(
    backbone=dict(conv_cfg=conv_cfg, norm_cfg=norm_cfg),
    neck=dict(conv_cfg=conv_cfg, norm_cfg=norm_cfg),
    bbox_head=dict(
        _delete_=True,
        type='Shared4Conv1FCBBoxHead',
        num_classes=80, in_channels=256, roi_size=7,
        conv_out_channels=256, fc_channels=1024,
        conv_cfg=conv_cfg, norm_cfg=norm_cfg))
