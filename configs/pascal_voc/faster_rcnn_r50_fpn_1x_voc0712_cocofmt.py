# Variant parity: reference configs/pascal_voc/faster_rcnn_r50_fpn_1x_voc0712_cocofmt.py
_base_ = ['faster_rcnn_r50_fpn_1x_voc0712.py']
# VOC in COCO-json format (converted by tools/dataset_converters)
data = dict(
    train=dict(_delete_=True, type='CocoDataset',
               ann_file='data/VOCdevkit/annotations/voc0712_trainval.json',
               img_prefix='data/VOCdevkit/'),
    val=dict(_delete_=True, type='CocoDataset',
             ann_file='data/VOCdevkit/annotations/voc07_test.json',
             img_prefix='data/VOCdevkit/'),
    test=dict(_delete_=True, type='CocoDataset',
              ann_file='data/VOCdevkit/annotations/voc07_test.json',
              img_prefix='data/VOCdevkit/'))
