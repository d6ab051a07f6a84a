# CentripetalNet Hourglass-104
# (reference configs/centripetalnet/centripetalnet_hourglass104_mstest_16x6_210e_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    _delete_=True,
    type='CentripetalNet',
    backbone=dict(type='HourglassNet', downsample_times=5, num_stacks=2,
                  stage_channels=[256, 256, 384, 384, 384, 512],
                  stage_blocks=[2, 2, 2, 2, 2, 4], feat_channel=256),
    bbox_head=dict(type='CentripetalHead', num_classes=80, in_channels=256,
                   num_feat_levels=2, corner_emb_channels=0),
    test_cfg=dict(corner_topk=100, local_maximum_kernel=3,
                  distance_threshold=0.5, score_thr=0.05,
                  nms=dict(iou_threshold=0.5), max_per_img=100))
