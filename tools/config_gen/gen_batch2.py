#!/usr/bin/env python3
"""Generate cascade_rcnn/mask_rcnn/faster_rcnn/guided_anchoring/seesaw_loss/
dcn variant configs (reference parity: same-named files under
/root/reference/configs/). Thin ``_base_`` deltas in our schema."""
import os

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))

FILES = {}

R101 = "model = dict(backbone=dict(depth=101))"
CAFFE = "model = dict(backbone=dict(style='caffe'))"
R101_CAFFE = "model = dict(backbone=dict(depth=101, style='caffe'))"


def x101(groups, base_width):
    return (f"model = dict(backbone=dict(_delete_=True, type='ResNeXt', "
            f"depth=101,\n    groups={groups}, base_width={base_width}, "
            "out_indices=(0, 1, 2, 3), frozen_stages=1))")


SCHED_20E = "lr_config = dict(step=[16, 19])\nrunner = dict(max_epochs=20)"
SCHED_2X = "lr_config = dict(step=[16, 22])\nrunner = dict(max_epochs=24)"

CAFFE_NORM = """img_norm_cfg = dict(mean=[103.530, 116.280, 123.675],
                    std=[1.0, 1.0, 1.0], to_rgb=False)"""


def mstrain_pipe(mask=False, poly=False, caffe=True, scales='value6'):
    ann = ", with_mask=True" if mask else ""
    ann += ", poly2mask=False" if poly else ""
    if scales == 'value6':
        resize = """dict(type='Resize',
         img_scale=[(1333, 640), (1333, 672), (1333, 704), (1333, 736),
                    (1333, 768), (1333, 800)],
         multiscale_mode='value', keep_ratio=True)"""
    else:
        resize = """dict(type='Resize', img_scale=[(1333, 640), (1333, 800)],
         multiscale_mode='range', keep_ratio=True)"""
    norm = CAFFE_NORM if caffe else """img_norm_cfg = dict(\
mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)"""
    return f"""{norm}
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True{ann}),
    {resize},
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))"""


def emit(path, body):
    fam = os.path.basename(os.path.dirname(path))
    FILES[path] = (f"# Variant parity: reference configs/{fam}/"
                   f"{os.path.basename(path)}\n" + body + "\n")


# ------------------------------------------------------------ cascade_rcnn
for kind in ('cascade_rcnn', 'cascade_mask_rcnn'):
    B = f'{kind}_r50_fpn_1x_coco.py'
    mask = kind == 'cascade_mask_rcnn'
    emit(f'configs/cascade_rcnn/{kind}_r101_fpn_1x_coco.py',
         f"_base_ = ['{B}']\n{R101}")
    emit(f'configs/cascade_rcnn/{kind}_r101_fpn_20e_coco.py',
         f"_base_ = ['{kind}_r101_fpn_1x_coco.py']\n{SCHED_20E}")
    emit(f'configs/cascade_rcnn/{kind}_r101_caffe_fpn_1x_coco.py',
         f"_base_ = ['{B}']\n{R101_CAFFE}\n{CAFFE_NORM}")
    emit(f'configs/cascade_rcnn/{kind}_r50_caffe_fpn_1x_coco.py',
         f"_base_ = ['{B}']\n{CAFFE}\n{CAFFE_NORM}")
    emit(f'configs/cascade_rcnn/{kind}_r50_fpn_20e_coco.py',
         f"_base_ = ['{B}']\n{SCHED_20E}")
    for g, bw in ((32, 4), (64, 4)):
        emit(f'configs/cascade_rcnn/{kind}_x101_{g}x{bw}d_fpn_1x_coco.py',
             f"_base_ = ['{B}']\n{x101(g, bw)}")
        emit(f'configs/cascade_rcnn/{kind}_x101_{g}x{bw}d_fpn_20e_coco.py',
             f"_base_ = ['{kind}_x101_{g}x{bw}d_fpn_1x_coco.py']\n{SCHED_20E}")
    if mask:
        ms = (f"{mstrain_pipe(mask=True, caffe=False, scales='range')}\n"
              "lr_config = dict(step=[27, 33])\nrunner = dict(max_epochs=36)")
        for name, delta in [
                ('r50_fpn', ''),
                ('r101_fpn', R101 + '\n'),
                ('r50_caffe_fpn', CAFFE + '\n' + CAFFE_NORM + '\n'),
                ('r101_caffe_fpn', R101_CAFFE + '\n' + CAFFE_NORM + '\n'),
                ('x101_32x4d_fpn', x101(32, 4) + '\n'),
                ('x101_32x8d_fpn', x101(32, 8) + '\n'),
                ('x101_64x4d_fpn', x101(64, 4) + '\n')]:
            emit(f'configs/cascade_rcnn/{kind}_{name}_mstrain_3x_coco.py',
                 f"_base_ = ['{B}']\n{delta}{ms}")
    else:
        # cascade (no mask) has no mstrain_3x refs beyond those emitted
        pass

# ------------------------------------------------------------- mask_rcnn
MB = 'mask_rcnn_r50_fpn_1x_coco.py'
emit('configs/mask_rcnn/mask_rcnn_r50_caffe_c4_1x_coco.py', """_base_ = [
    '../_base_/models/mask_rcnn_r50_caffe_c4.py',
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py', '../_base_/default_runtime.py'
]""")
emit('configs/mask_rcnn/mask_rcnn_r50_fpn_poly_1x_coco.py',
     f"_base_ = ['{MB}']\n" + """train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
         poly2mask=False),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type='Pad', size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))""")
emit('configs/mask_rcnn/mask_rcnn_r50_caffe_fpn_mstrain_1x_coco.py',
     f"_base_ = ['{MB}']\n{CAFFE}\n{mstrain_pipe(mask=True)}")
for sched, tail in [('1x', ''), ('2x', '\n' + SCHED_2X),
                    ('3x', "\nlr_config = dict(step=[27, 33])\n"
                           "runner = dict(max_epochs=36)")]:
    emit(f'configs/mask_rcnn/mask_rcnn_r50_caffe_fpn_mstrain-poly_{sched}_coco.py',
         f"_base_ = ['{MB}']\n{CAFFE}\n"
         f"{mstrain_pipe(mask=True, poly=True)}{tail}")
emit('configs/mask_rcnn/mask_rcnn_r101_caffe_fpn_mstrain-poly_3x_coco.py',
     f"_base_ = ['mask_rcnn_r50_caffe_fpn_mstrain-poly_3x_coco.py']\n{R101}")
emit('configs/mask_rcnn/mask_rcnn_r50_caffe_fpn_poly_1x_coco_v1.py',
     f"_base_ = ['{MB}']\n{CAFFE}\n{CAFFE_NORM}\n"
     """# legacy v1 protocol: smooth-L1 RPN (beta 1/9), poly masks
model = dict(rpn_head=dict(loss_bbox=dict(type='SmoothL1Loss',
                                          beta=1.0 / 9.0, loss_weight=1.0)))
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
         poly2mask=False),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))""")
for sched, tail in [('1x', ''),
                    ('3x', "\nlr_config = dict(step=[27, 33])\n"
                           "runner = dict(max_epochs=36)")]:
    emit(f'configs/mask_rcnn/mask_rcnn_x101_32x8d_fpn_mstrain-poly_{sched}_coco.py',
         f"_base_ = ['{MB}']\n{x101(32, 8)}\n"
         f"{mstrain_pipe(mask=True, poly=True, caffe=False)}{tail}")

# ------------------------------------------------------------ faster_rcnn
DC5 = """_base_ = [
    '../_base_/models/faster_rcnn_r50_caffe_dc5.py',
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py', '../_base_/default_runtime.py'
]"""
emit('configs/faster_rcnn/faster_rcnn_r50_caffe_dc5_1x_coco.py', DC5)
emit('configs/faster_rcnn/faster_rcnn_r50_caffe_dc5_mstrain_1x_coco.py',
     DC5 + '\n' + mstrain_pipe())
emit('configs/faster_rcnn/faster_rcnn_r50_caffe_dc5_mstrain_3x_coco.py',
     DC5 + '\n' + mstrain_pipe() +
     "\nlr_config = dict(step=[28, 34])\nrunner = dict(max_epochs=36)")
FB = 'faster_rcnn_r50_fpn_1x_coco.py'
emit('configs/faster_rcnn/faster_rcnn_r50_caffe_fpn_mstrain_90k_coco.py',
     "_base_ = ['faster_rcnn_r50_caffe_fpn_mstrain_1x_coco.py']\n"
     """# iteration-based 90k schedule (reference uses IterBasedRunner)
lr_config = dict(step=[60000, 80000], by_epoch=False)
runner = dict(_delete_=True, type='IterBasedRunner', max_iters=90000)""")
emit('configs/faster_rcnn/faster_rcnn_r50_caffe_fpn_mstrain_1x_coco-person.py',
     "_base_ = ['faster_rcnn_r50_caffe_fpn_mstrain_1x_coco.py']\n"
     """model = dict(bbox_head=dict(num_classes=1))
classes = ('person',)
data = dict(train=dict(classes=classes), val=dict(classes=classes),
            test=dict(classes=classes))""")
emit('configs/faster_rcnn/'
     'faster_rcnn_r50_caffe_fpn_mstrain_1x_coco-person-bicycle-car.py',
     "_base_ = ['faster_rcnn_r50_caffe_fpn_mstrain_1x_coco.py']\n"
     """model = dict(bbox_head=dict(num_classes=3))
classes = ('person', 'bicycle', 'car')
data = dict(train=dict(classes=classes), val=dict(classes=classes),
            test=dict(classes=classes))""")
for name, loss in [('iou', "dict(type='IoULoss', loss_weight=10.0)"),
                   ('giou', "dict(type='GIoULoss', loss_weight=10.0)"),
                   ('bounded_iou',
                    "dict(type='BoundedIoULoss', loss_weight=10.0)")]:
    emit(f'configs/faster_rcnn/faster_rcnn_r50_fpn_{name}_1x_coco.py',
         f"_base_ = ['{FB}']\n"
         f"model = dict(bbox_head=dict(reg_decoded_bbox=True,\n"
         f"                            loss_bbox={loss}))")

# -------------------------------------------------------- guided_anchoring
GA_RPN = """model = dict(
    rpn_head=dict(
        _delete_=True,
        type='GARPNHead',
        in_channels=256,
        feat_channels=256,
        strides=[4, 8, 16, 32, 64],
        octave_base_scale=8,
        approx_anchor_generator=dict(octave_base_scale=8,
                                     scales_per_octave=3,
                                     ratios=[0.5, 1.0, 2.0],
                                     strides=[4, 8, 16, 32, 64]),
        square_anchor_generator=dict(ratios=[1.0], scales=[8],
                                     strides=[4, 8, 16, 32, 64])))"""
emit('configs/guided_anchoring/ga_rpn_r50_fpn_1x_coco.py',
     "_base_ = ['../rpn/rpn_r50_fpn_1x_coco.py']\n" + GA_RPN)
emit('configs/guided_anchoring/ga_rpn_r50_caffe_fpn_1x_coco.py',
     "_base_ = ['ga_rpn_r50_fpn_1x_coco.py']\n"
     "model = dict(backbone=dict(style='caffe'))\n" + CAFFE_NORM)
emit('configs/guided_anchoring/ga_rpn_r101_caffe_fpn_1x_coco.py',
     "_base_ = ['ga_rpn_r50_caffe_fpn_1x_coco.py']\n"
     "model = dict(backbone=dict(depth=101))")
for g, bw in ((32, 4), (64, 4)):
    emit(f'configs/guided_anchoring/ga_rpn_x101_{g}x{bw}d_fpn_1x_coco.py',
         f"_base_ = ['ga_rpn_r50_fpn_1x_coco.py']\n{x101(g, bw)}")
emit('configs/guided_anchoring/ga_faster_r50_caffe_fpn_1x_coco.py',
     "_base_ = ['ga_faster_r50_fpn_1x_coco.py']\n"
     "model = dict(backbone=dict(style='caffe'))\n" + CAFFE_NORM)
emit('configs/guided_anchoring/ga_faster_x101_64x4d_fpn_1x_coco.py',
     f"_base_ = ['ga_faster_r50_fpn_1x_coco.py']\n{x101(64, 4)}")
emit('configs/guided_anchoring/ga_fast_r50_caffe_fpn_1x_coco.py',
     "_base_ = ['../fast_rcnn/fast_rcnn_r50_fpn_1x_coco.py']\n"
     "model = dict(backbone=dict(style='caffe'))\n" + CAFFE_NORM)
emit('configs/guided_anchoring/ga_retinanet_r50_caffe_fpn_1x_coco.py',
     "_base_ = ['ga_retinanet_r50_fpn_1x_coco.py']\n"
     "model = dict(backbone=dict(style='caffe'))\n" + CAFFE_NORM)
emit('configs/guided_anchoring/ga_retinanet_x101_64x4d_fpn_1x_coco.py',
     f"_base_ = ['ga_retinanet_r50_fpn_1x_coco.py']\n{x101(64, 4)}")
emit('configs/guided_anchoring/ga_retinanet_r101_caffe_fpn_mstrain_2x.py',
     "_base_ = ['ga_retinanet_r50_caffe_fpn_1x_coco.py']\n"
     "model = dict(backbone=dict(depth=101))\n"
     + mstrain_pipe(scales='range') + '\n' + SCHED_2X)

# ------------------------------------------------------------ seesaw_loss
SEESAW = "dict(type='SeesawLoss', p=0.8, q=2.0, loss_weight=1.0)"
NORMED = ("mask_head=dict(predictor_cfg=dict(type='NormedConv2d', "
          "tempearture=20))")
RANDOM_LVIS = """data = dict(train=dict(
    _delete_=True, type='LVISV1Dataset',
    ann_file='data/lvis_v1/annotations/lvis_v1_train.json',
    img_prefix='data/lvis_v1/'))"""
SB = 'mask_rcnn_r50_fpn_sample1e-3_seesaw_loss_mstrain_2x_lvis_v1.py'
emit(f'configs/seesaw_loss/mask_rcnn_r50_fpn_random_seesaw_loss_mstrain_2x_lvis_v1.py',
     f"_base_ = ['{SB}']\n{RANDOM_LVIS}")
emit(f'configs/seesaw_loss/mask_rcnn_r50_fpn_sample1e-3_seesaw_loss_normed_mask_mstrain_2x_lvis_v1.py',
     f"_base_ = ['{SB}']\nmodel = dict({NORMED})")
emit(f'configs/seesaw_loss/mask_rcnn_r50_fpn_random_seesaw_loss_normed_mask_mstrain_2x_lvis_v1.py',
     f"_base_ = ['{SB}']\nmodel = dict({NORMED})\n{RANDOM_LVIS}")
for tag, extra in [('sample1e-3_seesaw_loss', ''),
                   ('sample1e-3_seesaw_loss_normed_mask',
                    f"model = dict({NORMED})\n"),
                   ('random_seesaw_loss', RANDOM_LVIS + '\n'),
                   ('random_seesaw_loss_normed_mask',
                    f"model = dict({NORMED})\n" + RANDOM_LVIS + '\n')]:
    emit(f'configs/seesaw_loss/mask_rcnn_r101_fpn_{tag}_mstrain_2x_lvis_v1.py',
         f"_base_ = ['{SB}']\nmodel = dict(backbone=dict(depth=101))\n"
         + extra.rstrip())
CASCADE_SEESAW = f"""_base_ = ['../lvis/mask_rcnn_r50_fpn_sample1e-3_mstrain_1x_lvis_v1.py']
model = dict(
    _delete_=True,
    type='CascadeRCNN',
    backbone=dict(type='ResNet', depth=101, out_indices=(0, 1, 2, 3),
                  frozen_stages=1, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, num_outs=5),
    rpn_head=dict(type='RPNHead', in_channels=256, feat_channels=256,
                  strides=[4, 8, 16, 32, 64]),
    bbox_heads=[
        dict(type='Shared2FCBBoxHead', num_classes=1203, in_channels=256,
             roi_size=7, fc_channels=1024, target_stds=[0.1, 0.1, 0.2, 0.2],
             loss_cls={SEESAW}),
        dict(type='Shared2FCBBoxHead', num_classes=1203, in_channels=256,
             roi_size=7, fc_channels=1024,
             target_stds=[0.05, 0.05, 0.1, 0.1], loss_cls={SEESAW}),
        dict(type='Shared2FCBBoxHead', num_classes=1203, in_channels=256,
             roi_size=7, fc_channels=1024,
             target_stds=[0.033, 0.033, 0.067, 0.067], loss_cls={SEESAW}),
    ],
    mask_head=dict(type='FCNMaskHead', num_classes=1203, in_channels=256,
                   conv_out_channels=256, num_convs=4, roi_size=14{{MASKPRED}}),
    test_cfg=dict(rcnn=dict(score_thr=0.0001, nms=dict(iou_threshold=0.5),
                            max_per_img=300, mask_thr_binary=0.5)))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)"""
for tag, pred, extra in [
        ('sample1e-3_seesaw_loss', '', ''),
        ('sample1e-3_seesaw_loss_normed_mask',
         ",\n                   predictor_cfg=dict(type='NormedConv2d', "
         "tempearture=20)", ''),
        ('random_seesaw_loss', '', '\n' + RANDOM_LVIS),
        ('random_seesaw_loss_normed_mask',
         ",\n                   predictor_cfg=dict(type='NormedConv2d', "
         "tempearture=20)", '\n' + RANDOM_LVIS)]:
    emit(f'configs/seesaw_loss/cascade_mask_rcnn_r101_fpn_{tag}_mstrain_2x_lvis_v1.py',
         CASCADE_SEESAW.replace('{MASKPRED}', pred) + extra)

# ------------------------------------------------------------------- dcn
DCONV = ("model = dict(backbone=dict(dcn=dict(type='DCN'),\n"
         "                           stage_with_dcn=(False, True, True, "
         "True)))")
emit('configs/dcn/cascade_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py',
     "_base_ = ['../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py']\n" + DCONV)
emit('configs/dcn/cascade_rcnn_r101_fpn_dconv_c3-c5_1x_coco.py',
     "_base_ = ['cascade_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py']\n"
     "model = dict(backbone=dict(depth=101))")
emit('configs/dcn/cascade_mask_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py',
     "_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py']\n"
     + DCONV)
emit('configs/dcn/cascade_mask_rcnn_r101_fpn_dconv_c3-c5_1x_coco.py',
     "_base_ = ['cascade_mask_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py']\n"
     "model = dict(backbone=dict(depth=101))")
emit('configs/dcn/cascade_mask_rcnn_x101_32x4d_fpn_dconv_c3-c5_1x_coco.py',
     "_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py']\n"
     """model = dict(backbone=dict(_delete_=True, type='ResNeXt', depth=101,
    groups=32, base_width=4, out_indices=(0, 1, 2, 3), frozen_stages=1,
    dcn=dict(type='DCN'), stage_with_dcn=(False, True, True, True)))""")
emit('configs/dcn/mask_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py',
     "_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']\n" + DCONV)
emit('configs/dcn/mask_rcnn_r101_fpn_dconv_c3-c5_1x_coco.py',
     "_base_ = ['mask_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py']\n"
     "model = dict(backbone=dict(depth=101))")

if __name__ == '__main__':
    n = 0
    for path, content in FILES.items():
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, 'w') as f:
            f.write(content)
        n += 1
    print(f'wrote {n} files')
