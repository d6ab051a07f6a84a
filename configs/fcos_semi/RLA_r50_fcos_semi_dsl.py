# The flagship DSL config: RLA-R50 FCOS, teacher-student with dynamic
# pseudo-label refresh, adathres, scale-invariant si-soft loss.
# (Parity target: configs/fcos_semi/RLA_r50_caffe_mslonger_tricks_0.Xdata_
#  unlabel_dynamic_lw_nofuse_iterlabel_si-soft_singlestage.py)
_base_ = ['../_base_/default_runtime.py',
          '../_base_/schedules/schedule_semi.py']

model = dict(
    type='FCOS',
    backbone=dict(
        type='RLA_ResNet',
        layers=[3, 4, 6, 3],
        frozen_stages=1,
        norm_eval=True,
        style='pytorch',
        pretrained=None),   # set to a resnet50_rla .pth.tar to import
    neck=dict(
        type='FPN',
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        start_level=1,
        add_extra_convs='on_output',
        num_outs=5,
        relu_before_extra_convs=True),
    bbox_head=dict(
        type='FCOSHead',
        num_classes=80,
        in_channels=256,
        stacked_convs=4,
        feat_channels=256,
        strides=[8, 16, 32, 64, 128],
        norm_on_bbox=True,
        centerness_on_reg=True,
        center_sampling=True,
        conv_bias=True,
        # partially-labeled protocol uses 3.0; fully-labeled uses 1.0
        loss_weight=3.0,
        soft_weight=1.0,
        soft_warm_up=5000,
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='GIoULoss', loss_weight=1.0),
        loss_centerness=dict(type='CrossEntropyLoss', use_sigmoid=True,
                             loss_weight=1.0)),
    test_cfg=dict(
        nms_pre=1000,
        min_bbox_size=0,
        score_thr=0.05,
        nms=dict(type='nms', iou_threshold=0.6),
        max_per_img=100))

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=[(1333, 640), (1333, 800)],
         multiscale_mode='value', keep_ratio=True),
    dict(type='PatchShuffle', ratio=0.5, ranges=[0.0, 1.0],
         mode=['flip', 'flop']),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
unlabel_train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=[(1333, 640), (1333, 800)],
         multiscale_mode='value', keep_ratio=True),
    dict(type='PatchShuffle', ratio=0.5, ranges=[0.0, 1.0],
         mode=['flip', 'flop']),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='RandomAugmentBBox_Fast', aug_type='affine'),
    dict(type='UBAug'),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(1333, 800), flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=True),
             dict(type='RandomFlip'),
             dict(type='Normalize', **img_norm_cfg),
             dict(type='Pad', size_divisor=32),
         ]),
]

dataset_type = 'SemiCOCODataset'
data_root = 'data/semicoco/'
canvas_hw = (800, 1344)

data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    batch_config=dict(ratio=[[1, 1]]),
    train=dict(
        type=dataset_type,
        ann_file='data_list/coco_semi/semi_supervised/instances_train2017.2@10.json',
        ann_path=data_root + 'prepared_annos/Industry/annotations/full/',
        labelmapper=data_root + 'mmdet_category_info.json',
        img_prefix=data_root + 'images/full/',
        pipeline=train_pipeline),
    unlabel_train=dict(
        type=dataset_type,
        ann_file='data_list/coco_semi/semi_supervised/instances_train2017.2@10-unlabeled.json',
        ann_path=data_root + 'unlabel_prepared_annos/Industry/annotations/full/',
        labelmapper=data_root + 'mmdet_category_info.json',
        img_prefix=data_root + 'images/full/',
        pipeline=unlabel_train_pipeline,
        thres='adathres.json'),
    unlabel_pred=dict(
        type=dataset_type,
        image_root_path=data_root + 'images/full/',
        image_list_file='data_list/coco_semi/semi_supervised/instances_train2017.2@10-unlabeled.json',
        anno_root_path=data_root + 'unlabel_prepared_annos/Industry/annotations/full/',
        category_info_path=data_root + 'mmdet_category_info.json',
        infer_score_thre=0.1,
        save_file_format='json',
        pipeline=test_pipeline,
        eval_config={'iou': [0.6]},
        img_resize_size=(1333, 800),
        use_ema=True,
        eval_flip=False,
        fuse_history=False,
        first_fuse=False,
        first_score_thre=0.1,
        eval_checkpoint_config=dict(interval=1, mode='iteration'),
        preload=6,
        start_point=8),
    val=dict(
        type='CocoDataset',
        ann_file='data_list/coco_semi/semi_supervised/instances_val2017.json',
        img_prefix=data_root + 'valid_images/full/',
        pipeline=test_pipeline),
    test=dict(
        type='CocoDataset',
        ann_file='data_list/coco_semi/semi_supervised/instances_val2017.json',
        img_prefix=data_root + 'valid_images/full/',
        pipeline=test_pipeline))

evaluation = dict(interval=1, metric='bbox')
ema_config = dict(interval=1, mode='iteration', ratio=0.99, start_point=1)
scale_invariant = True
