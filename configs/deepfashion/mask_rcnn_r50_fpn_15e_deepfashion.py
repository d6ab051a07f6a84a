# Mask R-CNN on DeepFashion (reference configs/deepfashion/mask_rcnn_r50_fpn_15e_deepfashion.py)
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(bbox_head=dict(num_classes=15),
             mask_head=dict(num_classes=15))
data = dict(
    train=dict(_delete_=True, type='DeepFashionDataset',
               ann_file='data/DeepFashion/annotations/DeepFashion_segmentation_train.json',
               img_prefix='data/DeepFashion/Img/'),
    val=dict(_delete_=True, type='DeepFashionDataset',
             ann_file='data/DeepFashion/annotations/DeepFashion_segmentation_query.json',
             img_prefix='data/DeepFashion/Img/'),
    test=dict(_delete_=True, type='DeepFashionDataset',
              ann_file='data/DeepFashion/annotations/DeepFashion_segmentation_gallery.json',
              img_prefix='data/DeepFashion/Img/'))
