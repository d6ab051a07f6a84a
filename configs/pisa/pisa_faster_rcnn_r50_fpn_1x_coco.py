# PISA Faster R-CNN (reference configs/pisa/pisa_faster_rcnn_r50_fpn_1x_coco.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    type='PISAFasterRCNN',
    train_cfg=dict(isr=dict(k=2.0, bias=0.0),
                   carl=dict(k=1.0, bias=0.2)))
