# Variant parity: reference configs/instaboost/cascade_mask_rcnn_r50_fpn_instaboost_4x_coco.py
_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py']
data = dict(train=dict(pipeline_extra=[dict(type='InstaBoost',
                                            prob=0.5)]))
lr_config = dict(step=[32, 44])
runner = dict(max_epochs=48)
