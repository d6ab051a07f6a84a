# Variant parity: reference configs/faster_rcnn/faster_rcnn_r50_caffe_fpn_mstrain_90k_coco.py
_base_ = ['faster_rcnn_r50_caffe_fpn_mstrain_1x_coco.py']
# iteration-based 90k schedule (reference uses IterBasedRunner)
lr_config = dict(step=[60000, 80000], by_epoch=False)
runner = dict(_delete_=True, type='IterBasedRunner', max_iters=90000)
