"""Overfitting sanity: the full train step must actually learn.

Trains the tiny FCOS on a 2-image synthetic dataset with a fixed bright box
for ~60 steps and checks (a) the loss drops substantially and (b) the
detector localizes the object (IoU > 0.5 with the GT at high confidence).
This is the correctness signal the reference's unit tests never provide.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.models import build_detector, detector_predict
from dsl_tpu.train import (
    build_optimizer_from_cfg, create_train_state, frozen_backbone_mask,
    make_train_step)
from tests.test_models import _tiny_model_cfg


@pytest.mark.slow
def test_fcos_overfits_synthetic_box():
    rng = np.random.RandomState(0)
    size = 64
    imgs = np.full((2, size, size, 3), -1.0, np.float32)
    # bright square at a fixed location
    imgs[:, 12:40, 8:36] = 1.0
    gt = np.asarray([[[8.0, 12.0, 36.0, 40.0]]] * 2, np.float32)

    det = build_detector(_tiny_model_cfg(num_classes=2))
    variables = det.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
    tx, _ = build_optimizer_from_cfg(
        variables["params"],
        dict(type="SGD", lr=0.02, momentum=0.9, weight_decay=1e-4),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(warmup_iters=10, warmup_ratio=0.5),
        steps_per_epoch=1000)
    state = create_train_state(variables, tx, ema_ratio=0.9)
    step = jax.jit(make_train_step(det, tx, ema_interval=1,
                                   ema_start_iter=1))
    batch = dict(
        images=jnp.asarray(imgs),
        gt_bboxes=jnp.asarray(gt),
        gt_labels=jnp.ones((2, 1), jnp.int32),
        gt_valid=jnp.ones((2, 1), bool),
    )
    losses = []
    for _ in range(60):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    dets, labels, valid = detector_predict(
        det, state.student_variables, jnp.asarray(imgs),
        img_shapes=jnp.asarray([[size, size]] * 2, jnp.float32),
        scale_factors=jnp.ones((2, 4)),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.6), max_per_img=5))
    d = np.asarray(dets)[0]
    v = np.asarray(valid)[0]
    assert v.any(), "no detections after overfitting"
    best = d[v][0]
    # IoU with gt
    gx1, gy1, gx2, gy2 = gt[0, 0]
    ix1, iy1 = max(best[0], gx1), max(best[1], gy1)
    ix2, iy2 = min(best[2], gx2), min(best[3], gy2)
    inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
    union = ((best[2] - best[0]) * (best[3] - best[1])
             + (gx2 - gx1) * (gy2 - gy1) - inter)
    iou = inter / union
    assert iou > 0.5, f"top det {best} IoU {iou:.2f} with gt"
    assert int(np.asarray(labels)[0][v][0]) == 1
    # teacher EMA tracked the student and detects too
    t_dets, t_labels, t_valid = detector_predict(
        det, state.teacher_variables, jnp.asarray(imgs),
        img_shapes=jnp.asarray([[size, size]] * 2, jnp.float32),
        scale_factors=jnp.ones((2, 4)),
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.6), max_per_img=5))
    assert np.asarray(t_valid).any()
