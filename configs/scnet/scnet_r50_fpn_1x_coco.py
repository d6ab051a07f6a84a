# SCNet (reference configs/scnet/scnet_r50_fpn_1x_coco.py)
_base_ = ['../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py']
model = dict(
    type='SCNet',
    bbox_heads=[
        dict(type='SCNetBBoxHead', num_classes=80, in_channels=256,
             roi_size=7, fc_channels=1024,
             target_stds=[0.1, 0.1, 0.2, 0.2]),
        dict(type='SCNetBBoxHead', num_classes=80, in_channels=256,
             roi_size=7, fc_channels=1024,
             target_stds=[0.05, 0.05, 0.1, 0.1]),
        dict(type='SCNetBBoxHead', num_classes=80, in_channels=256,
             roi_size=7, fc_channels=1024,
             target_stds=[0.033, 0.033, 0.067, 0.067]),
    ],
    mask_head=dict(type='SCNetMaskHead', num_classes=80, in_channels=256,
                   conv_out_channels=256, num_convs=12, roi_size=14),
    semantic_head=dict(type='FusedSemanticHead', num_ins=5, fusion_level=1,
                       num_convs=4, in_channels=256, conv_out_channels=256,
                       num_classes=183, loss_weight=0.2),
    glbctx_head=dict(type='GlobalContextHead', num_convs=4, in_channels=256,
                     conv_out_channels=256, num_classes=80,
                     loss_weight=3.0, conv_to_res=True),
    relay_head=dict(type='FeatureRelayHead', in_channels=1024,
                    out_conv_channels=256, roi_feat_size=7,
                    scale_factor=2))
