# PointRend (reference configs/point_rend/point_rend_r50_caffe_fpn_mstrain_1x_coco.py)
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(
    type='PointRend',
    mask_head=dict(_delete_=True, type='CoarseMaskHead', num_classes=80,
                   in_channels=256, roi_size=14, num_convs=0, num_fcs=2,
                   fc_out_channels=1024, downsample_factor=2),
    point_head=dict(type='MaskPointHead', num_classes=80, num_fcs=3,
                    in_channels=256, fc_channels=256,
                    coarse_pred_each_layer=True),
    test_cfg=dict(rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                            max_per_img=100),
                  subdivision_steps=2, subdivision_num_points=196,
                  scale_factor=2))
