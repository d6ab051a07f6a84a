# Albu-style augmentation bank (reference configs/albu_example/mask_rcnn_r50_fpn_albu_1x_coco.py —
# transforms reimplemented natively in data/pipelines, no albumentations dep)
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
data = dict(train=dict(pipeline_extra=[
    dict(type='Albu', transforms=[
        dict(type='ShiftScaleRotate', shift_limit=0.0625,
             scale_limit=0.0, rotate_limit=0, p=0.5),
        dict(type='RandomBrightnessContrast', brightness_limit=[0.1, 0.3],
             contrast_limit=[0.1, 0.3], p=0.2),
        dict(type='ChannelShuffle', p=0.1),
        dict(type='Blur', blur_limit=3, p=0.1)])]))
