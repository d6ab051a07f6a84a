# Localization Distillation (reference configs/ld/ld_r18_gflv1_r101_fpn_coco_1x.py)
_base_ = ['../gfl/gfl_r50_fpn_1x_coco.py']
model = dict(
    type='KnowledgeDistillationSingleStageDetector',
    backbone=dict(type='ResNet', depth=18, out_indices=(0, 1, 2, 3)),
    neck=dict(in_channels=[64, 128, 256, 512]),
    bbox_head=dict(type='LDHead',
                   loss_ld=dict(type='KnowledgeDistillationKLDivLoss',
                                loss_weight=0.25, T=10)),
    teacher_config=dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=50, out_indices=(0, 1, 2, 3)),
        neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
                  out_channels=256, start_level=1,
                  add_extra_convs='on_output', num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(type='GFLHead', num_classes=80, in_channels=256,
                       feat_channels=256, stacked_convs=4)))
