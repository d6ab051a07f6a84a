# SSD300 on WIDER FACE (reference configs/wider_face/ssd300_wider_face.py)
_base_ = ['../ssd/ssd300_coco.py']
model = dict(bbox_head=dict(num_classes=1))
data = dict(
    train=dict(_delete_=True, type='WIDERFaceDataset',
               ann_file='data/WIDERFace/train.txt',
               img_prefix='data/WIDERFace/WIDER_train/'),
    val=dict(_delete_=True, type='WIDERFaceDataset',
             ann_file='data/WIDERFace/val.txt',
             img_prefix='data/WIDERFace/WIDER_val/'),
    test=dict(_delete_=True, type='WIDERFaceDataset',
              ann_file='data/WIDERFace/val.txt',
              img_prefix='data/WIDERFace/WIDER_val/'))
