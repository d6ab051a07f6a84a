"""Overfitting sanity beyond FCOS: the backward paths the torch train-step
oracle does not cover must still LEARN end-to-end.

- Faster R-CNN: gradients through RPN loss + deterministic RoI sampling +
  RoIAlign + bbox head (the two-stage composition has forward/loss oracles
  but no learning proof).
- DETR: gradients through the transformer and a loss whose targets come
  from the device Hungarian matcher (matching itself is non-differentiable
  assignment; learning proves the stop-gradient boundary is placed right).

Same recipe as tests/test_convergence.py: 2 synthetic images with one
bright box, a few dozen SGD steps, assert the loss drops and the detector
localizes (IoU > 0.5). The reference's test suite has no analog — its
test_forward.py only checks losses are finite
(/root/reference/tests/test_models/test_forward.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.models import build_detector
from dsl_tpu.models.detectors.single_stage import (
    detector_predict, init_detector_variables)
from dsl_tpu.train import (
    build_optimizer_from_cfg, create_train_state, make_train_step)

SIZE = 64
GT = np.asarray([[[8.0, 12.0, 36.0, 40.0]]] * 2, np.float32)


def _images():
    imgs = np.full((2, SIZE, SIZE, 3), -1.0, np.float32)
    imgs[:, 12:40, 8:36] = 1.0      # bright square = the object
    return imgs


def _overfit(cfg, lr, steps, test_cfg, loss_drop=0.5):
    imgs = _images()
    det = build_detector(cfg)
    variables = init_detector_variables(det, jax.random.PRNGKey(0),
                                        jnp.asarray(imgs))
    tx, _ = build_optimizer_from_cfg(
        variables["params"],
        dict(type="SGD", lr=lr, momentum=0.9, weight_decay=1e-4),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(warmup_iters=10, warmup_ratio=0.5),
        steps_per_epoch=10000)
    state = create_train_state(variables, tx, ema_ratio=0.9)
    step = jax.jit(make_train_step(det, tx, ema_interval=1,
                                   ema_start_iter=1))
    batch = dict(
        images=jnp.asarray(imgs),
        gt_bboxes=jnp.asarray(GT),
        gt_labels=jnp.ones((2, 1), jnp.int32),
        gt_valid=jnp.ones((2, 1), bool),
    )
    losses = []
    for _ in range(steps):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * loss_drop, (losses[0], losses[-1])

    dets, labels, valid = detector_predict(
        det, state.student_variables, jnp.asarray(imgs),
        img_shapes=jnp.asarray([[SIZE, SIZE]] * 2, jnp.float32),
        scale_factors=jnp.ones((2, 4)),
        test_cfg=test_cfg)
    d, v = np.asarray(dets)[0], np.asarray(valid)[0]
    assert v.any(), "no detections after overfitting"
    best = d[v][0]
    gx1, gy1, gx2, gy2 = GT[0, 0]
    ix1, iy1 = max(best[0], gx1), max(best[1], gy1)
    ix2, iy2 = min(best[2], gx2), min(best[3], gy2)
    inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
    union = ((best[2] - best[0]) * (best[3] - best[1])
             + (gx2 - gx1) * (gy2 - gy1) - inter)
    assert inter / union > 0.5, f"top det {best} IoU {inter / union:.2f}"
    assert int(np.asarray(labels)[0][v][0]) == 1


@pytest.mark.slow
def test_faster_rcnn_overfits_synthetic_box():
    cfg = dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=0, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      strides=[4, 8, 16, 32, 64]),
        bbox_head=dict(type="Shared2FCBBoxHead", num_classes=2,
                       in_channels=32, roi_size=7, fc_channels=64),
    )
    _overfit(cfg, lr=0.02, steps=60,
             test_cfg=dict(rcnn=dict(score_thr=0.05,
                                     nms=dict(iou_threshold=0.5),
                                     max_per_img=5)))


@pytest.mark.slow
def test_detr_overfits_synthetic_box():
    cfg = dict(
        type="DETR",
        backbone=dict(type="ResNet", depth=18, out_indices=(3,)),
        bbox_head=dict(type="DETRHead", num_classes=2, in_channels=512,
                       embed_dims=32, num_query=8, num_heads=4,
                       num_encoder_layers=2, num_decoder_layers=2,
                       ffn_dim=64),
    )
    # DETR converges slower (set prediction, no spatial prior): more steps,
    # gentler lr for the transformer.
    _overfit(cfg, lr=0.005, steps=150,
             test_cfg=dict(score_thr=0.05, max_per_img=5), loss_drop=0.7)
