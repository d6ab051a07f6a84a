# Seesaw-loss Mask R-CNN on LVIS v1
# (reference configs/seesaw_loss/mask_rcnn_r50_fpn_random_seesaw_loss_mstrain_2x_lvis_v1.py)
_base_ = ['../lvis/mask_rcnn_r50_fpn_sample1e-3_mstrain_1x_lvis_v1.py']
model = dict(bbox_head=dict(
    loss_cls=dict(type='SeesawLoss', p=0.8, q=2.0, loss_weight=1.0)))
