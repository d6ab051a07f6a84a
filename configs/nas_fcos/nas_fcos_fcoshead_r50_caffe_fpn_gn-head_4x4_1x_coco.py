# Variant parity: reference configs/nas_fcos/nas_fcos_fcoshead_r50_caffe_fpn_gn-head_4x4_1x_coco.py
_base_ = ['nas_fcos_nashead_r50_caffe_fpn_gn-head_4x4_1x_coco.py']
model = dict(bbox_head=dict(_delete_=True, type='FCOSHead',
                            num_classes=80, in_channels=256,
                            feat_channels=256,
                            norm_cfg=dict(type='GN', num_groups=32)))
