# Hybrid Task Cascade (reference configs/htc/htc_r50_fpn_1x_coco.py)
_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py']
model = dict(
    type='HTC',
    mask_head=None,
    mask_heads=[
        dict(type='HTCMaskHead', num_classes=80, in_channels=256,
             conv_out_channels=256, num_convs=4, roi_size=14,
             with_conv_res=False),
        dict(type='HTCMaskHead', num_classes=80, in_channels=256,
             conv_out_channels=256, num_convs=4, roi_size=14),
        dict(type='HTCMaskHead', num_classes=80, in_channels=256,
             conv_out_channels=256, num_convs=4, roi_size=14),
    ],
    semantic_head=dict(type='FusedSemanticHead', num_ins=5, fusion_level=1,
                       num_convs=4, in_channels=256, conv_out_channels=256,
                       num_classes=183, loss_weight=0.2))
