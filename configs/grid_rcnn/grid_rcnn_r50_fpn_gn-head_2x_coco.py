# Grid R-CNN (reference configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_2x_coco.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    type='GridRCNN',
    bbox_head=dict(with_reg=False),
    grid_head=dict(type='GridHead', grid_points=9, num_convs=8,
                   roi_size=14, in_channels=256, point_feat_channels=64),
    test_cfg=dict(rcnn=dict(score_thr=0.03, nms=dict(iou_threshold=0.3),
                            max_per_img=100)))
