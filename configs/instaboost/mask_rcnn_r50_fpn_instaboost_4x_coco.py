# InstaBoost augmentation (reference configs/instaboost/mask_rcnn_r50_fpn_instaboost_4x_coco.py)
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
data = dict(train=dict(pipeline_extra=[dict(type='InstaBoost', prob=0.5)]))
