# Variant parity: reference configs/pisa/pisa_mask_rcnn_r50_fpn_1x_coco.py
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(type='PISAMaskRCNN',
             train_cfg=dict(isr=dict(k=2.0, bias=0.0),
                            carl=dict(k=1.0, bias=0.2)))
