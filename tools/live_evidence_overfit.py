"""On-chip LEARNING evidence: overfit a tiny detector on the real TPU and
score it with the full eval stack.

The CPU-mesh convergence tests (tests/test_convergence*.py) prove the
train->eval stack *learns*; this CLI repeats that proof ON THE REAL CHIP:
60 jitted grad+clip+SGD+EMA steps on a 2-image synthetic bright-box set,
then `detector_predict` (student AND the EMA teacher) and `eval_map`
(the reference's VOC-protocol evaluator, itself torch-oracled in
tests/test_torch_oracle_eval.py) — asserting the loss collapses and the
learned detector reaches mAP@0.5 == 1.0 on its training images.

Usage:  python tools/live_evidence_overfit.py
        [--out evidence/live_overfit.json] [--steps 60]

Evidence tooling only — the reference has no analog CLI (its learning
signal is implicit in full COCO runs, README.md:240-244).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evidence/live_overfit.json")
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dsl_tpu.core.eval.mean_ap import eval_map
    from dsl_tpu.models import build_detector, detector_predict
    from dsl_tpu.train import (
        build_optimizer_from_cfg, create_train_state, make_train_step)

    platform = jax.devices()[0].platform
    size = 64
    imgs = np.full((2, size, size, 3), -1.0, np.float32)
    imgs[:, 12:40, 8:36] = 1.0        # bright square, fixed location
    gt = np.asarray([[[8.0, 12.0, 36.0, 40.0]]] * 2, np.float32)

    cfg = dict(
        type="FCOS",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_output", num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(type="FCOSHead", num_classes=2, in_channels=32,
                       stacked_convs=1, feat_channels=32,
                       strides=[8, 16, 32, 64, 128], norm_on_bbox=True,
                       centerness_on_reg=True, center_sampling=True,
                       loss_weight=3.0, soft_weight=1.0, soft_warm_up=10))
    det = build_detector(cfg)
    variables = det.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
    tx, _ = build_optimizer_from_cfg(
        variables["params"],
        dict(type="SGD", lr=0.02, momentum=0.9, weight_decay=1e-4),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(warmup_iters=10, warmup_ratio=0.5),
        steps_per_epoch=1000)
    state = create_train_state(variables, tx, ema_ratio=0.9)
    step = jax.jit(make_train_step(det, tx, ema_interval=1,
                                   ema_start_iter=1), donate_argnums=(0,))
    batch = dict(
        images=jnp.asarray(imgs),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.ones((2, 1), jnp.int32),
        gt_valid=jnp.ones((2, 1), bool),
    )
    t0 = time.perf_counter()
    losses = []
    for _ in range(args.steps):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))   # host fetch forces the chain
    t_train = time.perf_counter() - t0
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    test_cfg = dict(nms_pre=100, score_thr=0.05,
                    nms=dict(iou_threshold=0.6), max_per_img=5)
    shapes = jnp.asarray([[size, size]] * 2, jnp.float32)
    sf = jnp.ones((2, 4))

    def _score(variables):
        dets, labels, valid = detector_predict(
            det, variables, jnp.asarray(imgs),
            img_shapes=shapes, scale_factors=sf, test_cfg=test_cfg)
        dets, labels, valid = (np.asarray(dets), np.asarray(labels),
                               np.asarray(valid))
        det_results, anns = [], []
        for i in range(2):
            per_cls = [dets[i][(labels[i] == c) & valid[i]]
                       for c in range(2)]
            det_results.append(per_cls)
            anns.append(dict(bboxes=gt[i], labels=np.asarray([1])))
        m, _ = eval_map(det_results, anns, iou_thr=0.5)
        return float(m)

    map_student = _score(state.student_variables)
    map_teacher = _score(state.teacher_variables)

    rec = dict(platform=platform, steps=args.steps,
               loss_first=round(losses[0], 4), loss_last=round(losses[-1], 4),
               t_train_s=round(t_train, 2),
               map50_student=round(map_student, 4),
               map50_teacher=round(map_teacher, 4))
    print(rec, flush=True)
    assert map_student == 1.0, f"student mAP@0.5 {map_student} != 1.0"
    assert map_teacher == 1.0, f"teacher mAP@0.5 {map_teacher} != 1.0"
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(f"live overfit evidence OK on {platform} -> {args.out}")


if __name__ == "__main__":
    main()
