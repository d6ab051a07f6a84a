# Sparse R-CNN (reference configs/sparse_rcnn/sparse_rcnn_r50_fpn_1x_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
_dii = dict(type='DIIHead', num_classes=80, in_channels=256, roi_size=7,
            num_heads=8, feedforward_channels=2048, num_cls_fcs=1,
            num_reg_fcs=3, dynamic_feat_channels=64)
model = dict(
    _delete_=True,
    type='SparseRCNN',
    backbone=dict(type='ResNet', depth=50, out_indices=(0, 1, 2, 3)),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, num_outs=4),
    rpn_head=dict(type='EmbeddingRPNHead', num_proposals=100,
                  proposal_feature_channel=256),
    bbox_heads=[dict(_dii) for _ in range(6)],
    test_cfg=dict(max_per_img=100, score_thr=0.0))
