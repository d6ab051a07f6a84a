#!/usr/bin/env python3
"""Generate hrnet/regnet/gcnet variant configs (reference parity: the
same-named files under /root/reference/configs/{hrnet,regnet,gcnet}/).

Each emitted file is a thin ``_base_`` delta in our schema; run once from
the repo root. Kept in-tree so the sweep's provenance is reproducible.
"""
import os

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))

FILES = {}

# ---------------------------------------------------------------- HRNet
HR_CH = {'w18': (18, 36, 72, 144), 'w32': (32, 64, 128, 256),
         'w40': (40, 80, 160, 320)}


def hrnet_backbone_full(ch):
    return f"""dict(_delete_=True, type='HRNet', extra=dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(4,), num_channels=(64,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(4, 4), num_channels={ch[:2]}),
        stage3=dict(num_modules=4, num_branches=3, block='BASIC',
                    num_blocks=(4, 4, 4), num_channels={ch[:3]}),
        stage4=dict(num_modules=3, num_branches=4, block='BASIC',
                    num_blocks=(4, 4, 4, 4), num_channels={ch})))"""


def hrnet_channel_delta(ch):
    return f"""dict(extra=dict(
        stage2=dict(num_channels={ch[:2]}),
        stage3=dict(num_channels={ch[:3]}),
        stage4=dict(num_channels={ch})))"""


for fam, base, sched in [
        ('faster_rcnn', '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py', '1x'),
        ('mask_rcnn', '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py', '1x'),
        ('cascade_rcnn', '../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py',
         '20e'),
        ('cascade_mask_rcnn',
         '../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py', '20e'),
        ('htc', '../htc/htc_r50_fpn_1x_coco.py', '20e')]:
    root = f'configs/hrnet/{fam}_hrnetv2p_w32_{sched}_coco.py'
    sched_txt = ''
    if sched == '20e':
        sched_txt = ("\nlr_config = dict(step=[16, 19])\n"
                     "runner = dict(max_epochs=20)")
    ch = HR_CH['w32']
    FILES[root] = f"""# HRNetV2p-W32 {fam} (reference configs/hrnet/{os.path.basename(root)})
_base_ = ['{base}']
model = dict(
    backbone={hrnet_backbone_full(ch)},
    neck=dict(_delete_=True, type='HRFPN', in_channels={list(ch)},
              out_channels=256, num_outs=5)){sched_txt}
"""
    for w in ('w18', 'w40'):
        ch = HR_CH[w]
        p = f'configs/hrnet/{fam}_hrnetv2p_{w}_{sched}_coco.py'
        FILES[p] = f"""# HRNetV2p-{w.upper()} {fam} (reference configs/hrnet/{os.path.basename(p)})
_base_ = ['{os.path.basename(root)}']
model = dict(
    backbone={hrnet_channel_delta(ch)},
    neck=dict(in_channels={list(ch)}))
"""
    if sched == '1x':
        for w in ('w18', 'w32', 'w40'):
            p = f'configs/hrnet/{fam}_hrnetv2p_{w}_2x_coco.py'
            FILES[p] = f"""# 2x schedule (reference configs/hrnet/{os.path.basename(p)})
_base_ = ['{fam}_hrnetv2p_{w}_1x_coco.py']
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
"""

# htc w40 28e
FILES['configs/hrnet/htc_hrnetv2p_w40_28e_coco.py'] = """# 28-epoch HTC-W40 \
(reference configs/hrnet/htc_hrnetv2p_w40_28e_coco.py)
_base_ = ['htc_hrnetv2p_w40_20e_coco.py']
lr_config = dict(step=[24, 27])
runner = dict(max_epochs=28)
"""
FILES['configs/hrnet/htc_x101_64x4d_fpn_16x1_28e_coco.py'] = """# HTC \
X-101-64x4d, 16 GPUs x 1 img, 28 epochs (reference
# configs/hrnet/htc_x101_64x4d_fpn_16x1_28e_coco.py)
_base_ = ['../htc/htc_r50_fpn_1x_coco.py']
model = dict(backbone=dict(_delete_=True, type='ResNeXt', depth=101,
                           groups=64, base_width=4, out_indices=(0, 1, 2, 3),
                           frozen_stages=1))
data = dict(samples_per_gpu=1)
lr_config = dict(step=[24, 27])
runner = dict(max_epochs=28)
"""

# fcos hrnet variants (anchor: fcos_hrnetv2p_w18_gn-head_4x4_1x_coco.py)
FILES['configs/hrnet/fcos_hrnetv2p_w32_gn-head_4x4_1x_coco.py'] = f"""# FCOS \
HRNetV2p-W32 (reference configs/hrnet/fcos_hrnetv2p_w32_gn-head_4x4_1x_coco.py)
_base_ = ['fcos_hrnetv2p_w18_gn-head_4x4_1x_coco.py']
model = dict(
    backbone={hrnet_channel_delta(HR_CH['w32'])},
    neck=dict(in_channels={list(HR_CH['w32'])}))
data = dict(samples_per_gpu=4)
"""
for w in ('w18', 'w32'):
    p = f'configs/hrnet/fcos_hrnetv2p_{w}_gn-head_4x4_2x_coco.py'
    FILES[p] = f"""# 2x schedule (reference configs/hrnet/{os.path.basename(p)})
_base_ = ['fcos_hrnetv2p_{w}_gn-head_4x4_1x_coco.py']
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
"""

MSTRAIN_PIPE = """img_norm_cfg = dict(mean=[103.53, 116.28, 123.675],
                    std=[57.375, 57.12, 58.395], to_rgb=False)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=[(1333, 640), (1333, 800)],
         multiscale_mode='value', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))"""

for w, basef in [('w18', 'fcos_hrnetv2p_w18_gn-head_4x4_1x_coco.py'),
                 ('w32', 'fcos_hrnetv2p_w32_gn-head_4x4_1x_coco.py')]:
    p = f'configs/hrnet/fcos_hrnetv2p_{w}_gn-head_mstrain_640-800_4x4_2x_coco.py'
    FILES[p] = f"""# mstrain 640-800, 2x (reference configs/hrnet/{os.path.basename(p)})
_base_ = ['{basef}']
{MSTRAIN_PIPE}
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
"""
p = 'configs/hrnet/fcos_hrnetv2p_w40_gn-head_mstrain_640-800_4x4_2x_coco.py'
FILES[p] = f"""# W40 mstrain (reference configs/hrnet/{os.path.basename(p)})
_base_ = ['fcos_hrnetv2p_w32_gn-head_mstrain_640-800_4x4_2x_coco.py']
model = dict(
    backbone={hrnet_channel_delta(HR_CH['w40'])},
    neck=dict(in_channels={list(HR_CH['w40'])}))
"""

# ---------------------------------------------------------------- RegNet
# group-width-adjusted stage widths (generate_regnet(..., group_w) —
# matches the reference configs' FPN in_channels)
REG_W = {'400MF': ('regnetx_400mf', [32, 64, 160, 384]),
         '800MF': ('regnetx_800mf', [64, 128, 288, 672]),
         '1.6GF': ('regnetx_1.6gf', [72, 168, 408, 912]),
         '3.2GF': ('regnetx_3.2gf', [96, 192, 432, 1008]),
         '4GF': ('regnetx_4.0gf', [80, 240, 560, 1360]),
         '6.4GF': ('regnetx_6.4gf', [168, 392, 784, 1624]),
         '8GF': ('regnetx_8.0gf', [80, 240, 720, 1920]),
         '12GF': ('regnetx_12gf', [224, 448, 896, 2240])}

REGNET_NORM = """img_norm_cfg = dict(mean=[103.53, 116.28, 123.675],
                    std=[57.375, 57.12, 58.395], to_rgb=False)"""


def regnet_model(size, fpn_start1=False):
    arch, ch = REG_W[size]
    if fpn_start1:
        neck = f"neck=dict(in_channels={ch})"
    else:
        neck = (f"neck=dict(_delete_=True, type='FPN', in_channels={ch}, "
                "out_channels=256,\n              start_level=0, num_outs=5)")
    return f"""model = dict(
    backbone=dict(_delete_=True, type='RegNet', arch='{arch}',
                  out_indices=(0, 1, 2, 3)),
    {neck})
optimizer = dict(weight_decay=0.00005)
{REGNET_NORM}"""


MSTRAIN_3X = """train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True{MASK}),
    dict(type='Resize', img_scale=[(1333, 640), (1333, 800)],
         multiscale_mode='range', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)"""

for size in ('1.6GF', '3.2GF', '400MF', '4GF', '800MF'):
    p = f'configs/regnet/faster_rcnn_regnetx-{size}_fpn_mstrain_3x_coco.py'
    FILES[p] = f"""# RegNetX-{size} Faster R-CNN mstrain 3x (reference configs/regnet/{os.path.basename(p)})
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
{regnet_model(size)}
{MSTRAIN_3X.replace('{MASK}', '')}
"""
    p = f'configs/regnet/cascade_mask_rcnn_regnetx-{size}_fpn_mstrain_3x_coco.py'
    FILES[p] = f"""# RegNetX-{size} Cascade Mask R-CNN mstrain 3x (reference configs/regnet/{os.path.basename(p)})
_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py']
{regnet_model(size)}
{MSTRAIN_3X.replace('{MASK}', ', with_mask=True')}
"""

FILES['configs/regnet/faster_rcnn_regnetx-3.2GF_fpn_2x_coco.py'] = """# 2x \
(reference configs/regnet/faster_rcnn_regnetx-3.2GF_fpn_2x_coco.py)
_base_ = ['faster_rcnn_regnetx-3.2GF_fpn_1x_coco.py']
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
"""

for size in ('3.2GF', '4GF', '6.4GF', '8GF', '12GF'):
    p = f'configs/regnet/mask_rcnn_regnetx-{size}_fpn_1x_coco.py'
    FILES[p] = f"""# RegNetX-{size} Mask R-CNN (reference configs/regnet/{os.path.basename(p)})
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
{regnet_model(size)}
"""

p = 'configs/regnet/mask_rcnn_regnetx-3.2GF_fpn_mdconv_c3-c5_1x_coco.py'
FILES[p] = f"""# + modulated DCN c3-c5 (reference configs/regnet/{os.path.basename(p)})
_base_ = ['mask_rcnn_regnetx-3.2GF_fpn_1x_coco.py']
model = dict(backbone=dict(dcn=dict(type='DCNv2'),
                           stage_with_dcn=(False, True, True, True)))
"""

p = 'configs/regnet/mask_rcnn_regnetx-3.2GF_fpn_mstrain_3x_coco.py'
FILES[p] = f"""# mstrain 3x (reference configs/regnet/{os.path.basename(p)})
_base_ = ['mask_rcnn_regnetx-3.2GF_fpn_1x_coco.py']
img_norm_cfg = dict(mean=[103.53, 116.28, 123.675],
                    std=[57.375, 57.12, 58.395], to_rgb=False)
{MSTRAIN_3X.replace('{MASK}', ', with_mask=True')}
"""

for size in ('1.6GF', '400MF', '4GF', '800MF'):
    p = f'configs/regnet/mask_rcnn_regnetx-{size}_fpn_mstrain-poly_3x_coco.py'
    FILES[p] = f"""# RegNetX-{size} Mask R-CNN mstrain-poly 3x (reference configs/regnet/{os.path.basename(p)})
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
{regnet_model(size)}
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
         poly2mask=False),
    dict(type='Resize', img_scale=[(1333, 640), (1333, 800)],
         multiscale_mode='range', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
data = dict(train=dict(pipeline=train_pipeline))
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
"""

for size in ('1.6GF', '3.2GF', '800MF'):
    p = f'configs/regnet/retinanet_regnetx-{size}_fpn_1x_coco.py'
    FILES[p] = f"""# RegNetX-{size} RetinaNet (reference configs/regnet/{os.path.basename(p)})
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
{regnet_model(size, fpn_start1=True)}
"""

# ---------------------------------------------------------------- GCNet
X101 = ("_delete_=True, type='ResNeXt', depth=101, groups=32, "
        "base_width=4,\n    out_indices=(0, 1, 2, 3), frozen_stages=1")
SYNC = "norm_cfg=dict(type='SyncBN', requires_grad=True)"


def gcb(ratio):
    return ("plugins=[dict(cfg=dict(type='ContextBlock', ratio=1. / "
            f"{ratio}),\n                 stages=(False, True, True, True), "
            "position='after_conv3')]")


def gcnet_file(path, base, backbone_parts):
    FILES[path] = f"""# GCNet variant (reference configs/gcnet/{os.path.basename(path)})
_base_ = ['{base}']
model = dict(backbone=dict({backbone_parts}))
"""

MB = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
CB = '../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py'
gcnet_file('configs/gcnet/mask_rcnn_r50_fpn_r16_gcb_c3-c5_1x_coco.py', MB, gcb(16))
gcnet_file('configs/gcnet/mask_rcnn_r50_fpn_syncbn-backbone_1x_coco.py', MB, SYNC)
gcnet_file('configs/gcnet/mask_rcnn_r50_fpn_syncbn-backbone_r4_gcb_c3-c5_1x_coco.py',
           MB, SYNC + ',\n    ' + gcb(4))
gcnet_file('configs/gcnet/mask_rcnn_r50_fpn_syncbn-backbone_r16_gcb_c3-c5_1x_coco.py',
           MB, SYNC + ',\n    ' + gcb(16))
for r in (4, 16):
    gcnet_file(f'configs/gcnet/mask_rcnn_r101_fpn_r{r}_gcb_c3-c5_1x_coco.py',
               MB, 'depth=101, ' + gcb(r))
    gcnet_file(
        f'configs/gcnet/mask_rcnn_r101_fpn_syncbn-backbone_r{r}_gcb_c3-c5_1x_coco.py',
        MB, 'depth=101, ' + SYNC + ',\n    ' + gcb(r))
    gcnet_file(
        f'configs/gcnet/mask_rcnn_x101_32x4d_fpn_syncbn-backbone_r{r}_gcb_c3-c5_1x_coco.py',
        MB, X101 + ', ' + SYNC + ',\n    ' + gcb(r))
gcnet_file('configs/gcnet/mask_rcnn_r101_fpn_syncbn-backbone_1x_coco.py',
           MB, 'depth=101, ' + SYNC)
gcnet_file('configs/gcnet/mask_rcnn_x101_32x4d_fpn_syncbn-backbone_1x_coco.py',
           MB, X101 + ', ' + SYNC)
gcnet_file('configs/gcnet/cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_1x_coco.py',
           CB, X101 + ', ' + SYNC)
gcnet_file(
    'configs/gcnet/cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_dconv_c3-c5_1x_coco.py',
    CB, X101 + ', ' + SYNC + ",\n    dcn=dict(type='DCN'), "
    "stage_with_dcn=(False, True, True, True)")
for r in (4, 16):
    gcnet_file(
        f'configs/gcnet/cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_r{r}_gcb_c3-c5_1x_coco.py',
        CB, X101 + ', ' + SYNC + ',\n    ' + gcb(r))
    gcnet_file(
        f'configs/gcnet/cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_dconv_c3-c5_r{r}_gcb_c3-c5_1x_coco.py',
        CB, X101 + ', ' + SYNC + ",\n    dcn=dict(type='DCN'), "
        "stage_with_dcn=(False, True, True, True),\n    " + gcb(r))

if __name__ == '__main__':
    n = 0
    for path, content in FILES.items():
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, 'w') as f:
            f.write(content)
        n += 1
    print(f'wrote {n} files')
