# Variant parity: reference configs/dcn/faster_rcnn_r50_fpn_dpool_1x_coco.py
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(roi_pool_pack=dict(type='DeformRoIPoolPack', output_size=7,
                                output_channels=256))
