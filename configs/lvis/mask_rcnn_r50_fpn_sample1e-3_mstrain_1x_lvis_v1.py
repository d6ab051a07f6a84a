# Mask R-CNN on LVIS v1 (reference configs/lvis/mask_rcnn_r50_fpn_sample1e-3_mstrain_1x_lvis_v1.py)
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(bbox_head=dict(num_classes=1203))
data = dict(
    train=dict(_delete_=True, type='ClassBalancedDataset', oversample_thr=1e-3,
               dataset=dict(type='LVISV1Dataset',
                            ann_file='data/lvis_v1/annotations/lvis_v1_train.json',
                            img_prefix='data/lvis_v1/')),
    val=dict(type='LVISV1Dataset',
             ann_file='data/lvis_v1/annotations/lvis_v1_val.json',
             img_prefix='data/lvis_v1/'),
    test=dict(type='LVISV1Dataset',
              ann_file='data/lvis_v1/annotations/lvis_v1_val.json',
              img_prefix='data/lvis_v1/'))
