# DCN on ResNeXt-101 32x4d (reference configs/dcn/faster_rcnn_x101_32x4d_fpn_dconv_c3-c5_1x_coco.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_coco.py']
model = dict(backbone=dict(_delete_=True, type='ResNeXt', depth=101,
                           groups=32, base_width=4, out_indices=(0, 1, 2, 3),
                           dcn=dict(type='DCNv2'),
                           stage_with_dcn=(False, True, True, True)))
