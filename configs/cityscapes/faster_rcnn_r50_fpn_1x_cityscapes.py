# Faster R-CNN on Cityscapes (reference configs/cityscapes/faster_rcnn_r50_fpn_1x_cityscapes.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(bbox_head=dict(num_classes=8))
data = dict(
    train=dict(_delete_=True, type='CityscapesDataset',
               ann_file='data/cityscapes/annotations/instancesonly_filtered_gtFine_train.json',
               img_prefix='data/cityscapes/leftImg8bit/train/'),
    val=dict(_delete_=True, type='CityscapesDataset',
             ann_file='data/cityscapes/annotations/instancesonly_filtered_gtFine_val.json',
             img_prefix='data/cityscapes/leftImg8bit/val/'),
    test=dict(_delete_=True, type='CityscapesDataset',
              ann_file='data/cityscapes/annotations/instancesonly_filtered_gtFine_val.json',
              img_prefix='data/cityscapes/leftImg8bit/val/'))
