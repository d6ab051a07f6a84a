"""int8 PTQ end-to-end: a trained (overfit) detector still localizes its
object when the whole predict path runs through `quantize_convs` — the
deployment-quality signal for the int8 serving mode (the post-overfit
analog of the reference's TensorRT `--verify` story)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.models import build_detector, detector_predict
from dsl_tpu.train import (
    build_optimizer_from_cfg, create_train_state, make_train_step)
from dsl_tpu.utils.quantize import quantize_convs
from tests.test_models import _tiny_model_cfg


@pytest.mark.slow
def test_int8_predict_keeps_detections_after_overfit():
    rng = np.random.RandomState(0)
    size = 64
    imgs = np.full((2, size, size, 3), -1.0, np.float32)
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
    batch = dict(images=jnp.asarray(imgs), gt_bboxes=jnp.asarray(gt),
                 gt_labels=jnp.ones((2, 1), jnp.int32),
                 gt_valid=jnp.ones((2, 1), bool))
    for _ in range(60):
        state, _m = step(state, batch)

    tc = dict(nms_pre=100, score_thr=0.05, nms=dict(iou_threshold=0.6),
              max_per_img=5)
    sv = state.student_variables

    def predict(images):
        return detector_predict(
            det, sv, images,
            img_shapes=jnp.asarray([[size, size]] * 2, jnp.float32),
            scale_factors=jnp.ones((2, 4)), test_cfg=tc)

    d32, l32, v32 = predict(jnp.asarray(imgs))
    d8, l8, v8 = jax.jit(quantize_convs(predict))(jnp.asarray(imgs))

    gx1, gy1, gx2, gy2 = gt[0, 0]

    def top_iou(dets, valid):
        d, v = np.asarray(dets)[0], np.asarray(valid)[0]
        assert v.any()
        b = d[v][0]
        ix1, iy1 = max(b[0], gx1), max(b[1], gy1)
        ix2, iy2 = min(b[2], gx2), min(b[3], gy2)
        inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
        union = ((b[2] - b[0]) * (b[3] - b[1])
                 + (gx2 - gx1) * (gy2 - gy1) - inter)
        return inter / union, b

    iou32, b32 = top_iou(d32, v32)
    iou8, b8 = top_iou(d8, v8)
    assert iou32 > 0.5 and iou8 > 0.5, (iou32, iou8)
    assert int(np.asarray(l8)[0][np.asarray(v8)[0]][0]) == 1
    # int8 boxes track the f32 boxes within a couple of pixels
    np.testing.assert_allclose(b8[:4], b32[:4], atol=3.0)
    # and the top scores stay close
    assert abs(float(b8[4]) - float(b32[4])) < 0.1
