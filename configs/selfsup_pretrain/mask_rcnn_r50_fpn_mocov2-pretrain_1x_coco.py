# Self-supervised pretrained backbone (reference
# configs/selfsup_pretrain/mask_rcnn_r50_fpn_mocov2-pretrain_1x_coco.py):
# convert the MoCo checkpoint first:
#   python tools/convert_checkpoint.py mocov2.pth mocov2_mmdet.pth --style moco
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(frozen_stages=0, norm_eval=False,
                           pretrained='mocov2_mmdet.pth'))
