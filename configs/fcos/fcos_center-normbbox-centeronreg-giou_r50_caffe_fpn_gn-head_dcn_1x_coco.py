# FCOS w/ all tricks + DCNv2 on the towers' last conv (reference
# configs/fcos/fcos_center-normbbox-centeronreg-giou_..._dcn_1x_coco.py)
_base_ = ['fcos_r50_caffe_fpn_gn-head_1x_coco.py']
model = dict(
    bbox_head=dict(
        dcn_on_last_conv=True,
        loss_bbox=dict(type='GIoULoss', loss_weight=1.0)))
