# Dynamic R-CNN (reference configs/dynamic_rcnn/dynamic_rcnn_r50_fpn_1x.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    type='DynamicRCNN',
    train_cfg=dict(dynamic_rcnn=dict(iou_topk=75, beta_topk=10,
                                     update_iter_interval=100,
                                     initial_iou=0.4, initial_beta=1.0)))
