# PISA Faster R-CNN with Score-HLR negative sampling
# (reference configs/pisa/pisa_faster_rcnn_r50_fpn_1x_coco.py, sampler=ScoreHLRSampler)
_base_ = ['./pisa_faster_rcnn_r50_fpn_1x_coco.py']
model = dict(train_cfg=dict(
    isr_n=dict(k=0.5, bias=0.0, score_thr=0.05, iou_thr=0.5)))
