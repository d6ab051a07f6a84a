# RegNetX-12GF Mask R-CNN (reference configs/regnet/mask_rcnn_regnetx-12GF_fpn_1x_coco.py)
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(
    backbone=dict(_delete_=True, type='RegNet', arch='regnetx_12gf',
                  out_indices=(0, 1, 2, 3)),
    neck=dict(_delete_=True, type='FPN', in_channels=[224, 448, 896, 2240], out_channels=256,
              start_level=0, num_outs=5))
optimizer = dict(weight_decay=0.00005)
img_norm_cfg = dict(mean=[103.53, 116.28, 123.675],
                    std=[57.375, 57.12, 58.395], to_rgb=False)
