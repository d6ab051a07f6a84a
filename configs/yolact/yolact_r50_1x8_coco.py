# YOLACT R-50 (reference configs/yolact/yolact_r50_1x8_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    _delete_=True,
    type='YOLACT',
    backbone=dict(type='ResNet', depth=50, out_indices=(0, 1, 2, 3),
                  # reference yolact config: train stem + BN stats, and do
                  # NOT zero-init the residual bn3
                  frozen_stages=-1, norm_eval=False,
                  zero_init_residual=False),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1, num_outs=5,
              add_extra_convs='on_input',
              upsample_cfg=dict(mode='bilinear')),
    bbox_head=dict(type='YOLACTHead', num_classes=80, in_channels=256,
                   feat_channels=256, num_head_convs=1, num_protos=32,
                   anchor_generator=dict(octave_base_scale=3,
                                         scales_per_octave=1,
                                         ratios=[0.5, 1.0, 2.0],
                                         strides=[8, 16, 32, 64, 128])),
    segm_head=dict(type='YOLACTSegmHead', num_classes=80, in_channels=256),
    mask_head=dict(type='YOLACTProtonet', num_protos=32, in_channels=256,
                   loss_mask_weight=6.125),
    test_cfg=dict(nms_pre=1000, score_thr=0.05, iou_thr=0.5,
                  nms=dict(iou_threshold=0.5), max_per_img=100))
