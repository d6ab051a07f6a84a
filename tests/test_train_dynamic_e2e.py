"""End-to-end: train_detector drives the Dynamic R-CNN schedule wiring
(dyn_iou_thr/dyn_beta threaded through batches, stats fed back)."""

import json

import numpy as np
import cv2
import pytest

from dsl_tpu.config import Config


def _make_coco(tmp_path, n=4):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(n):
        name = f"{i}.jpg"
        cv2.imwrite(str(img_dir / name),
                    rng.randint(0, 255, (64, 64, 3), np.uint8))
        images.append(dict(id=i + 1, file_name=name, width=64, height=64))
        anns.append(dict(id=i + 1, image_id=i + 1, category_id=1,
                         bbox=[8, 8, 30, 30], area=900, iscrowd=0))
    ann = dict(images=images, categories=[dict(id=1, name="c")],
               annotations=anns)
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    return str(p), str(img_dir)


@pytest.mark.slow
def test_train_detector_dynamic_rcnn_schedule(tmp_path):
    from dsl_tpu.apis.train import train_detector

    ann, imgs = _make_coco(tmp_path)
    ds = dict(type="CocoDataset", ann_file=ann, img_prefix=imgs,
              pipeline=[
                  dict(type="LoadImageFromFile"),
                  dict(type="LoadAnnotations", with_bbox=True),
                  dict(type="Resize", img_scale=(64, 64), keep_ratio=True),
                  dict(type="RandomFlip", flip_ratio=0.0),
                  dict(type="Normalize", mean=[0, 0, 0], std=[1, 1, 1],
                       to_rgb=True),
                  dict(type="Pad", size_divisor=32)])
    cfg = Config(dict(
        model=dict(
            type="DynamicRCNN",
            backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, start_level=0, num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                          strides=[4, 8, 16, 32, 64]),
            bbox_head=dict(type="Shared2FCBBoxHead", num_classes=1,
                           in_channels=32, roi_size=7, fc_channels=64),
            train_cfg=dict(dynamic_rcnn=dict(
                iou_topk=8, beta_topk=2, update_iter_interval=2,
                initial_iou=0.4, initial_beta=1.0)),
            test_cfg=dict(rcnn=dict(score_thr=0.05,
                                    nms=dict(iou_threshold=0.5),
                                    max_per_img=10))),
        canvas_hw=(64, 64),
        data=dict(samples_per_gpu=2, workers_per_gpu=0,
                  train=ds, val=dict(ds), test=dict(ds)),
        optimizer=dict(type="SGD", lr=0.001, momentum=0.9,
                       weight_decay=1e-4),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(warmup="linear", warmup_iters=2,
                       warmup_ratio=0.5, step=[100]),
        runner=dict(type="SemiEpochBasedRunner", max_epochs=1),
        checkpoint_config=dict(interval=1),
        evaluation=dict(interval=100),        # skip val eval
        log_config=dict(interval=1),
    ))
    work = tmp_path / "work"
    work.mkdir()
    runner = train_detector(cfg, str(work), max_devices=1)
    # the per-step dynamic statistics flowed through the log buffer
    logs = runner.log_buffer.history
    assert "dynamic_iou" in logs and len(logs["dynamic_iou"]) >= 2
    assert all(np.isfinite(v) for v in logs["loss"])
