"""Single-image inference API.

Parity with ``/root/reference/mmdet/apis/inference.py:16-240``:
``init_detector(config, checkpoint)`` builds the model + loads weights and
returns a bundle; ``inference_detector(bundle, img)`` accepts a path or
ndarray and returns per-class box lists (the mmdet result format:
list of C arrays (n_i, 5)); ``show_result`` draws them.
"""

from __future__ import annotations

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from dsl_tpu.config import Config
from dsl_tpu.data.formatting import DEFAULT_CANVAS
from dsl_tpu.models.detectors.single_stage import (
    build_detector, detector_predict)


class DetectorBundle:
    def __init__(self, detector, variables, cfg, canvas_hw=DEFAULT_CANVAS):
        self.detector = detector
        self.variables = variables
        self.cfg = cfg
        self.canvas_hw = canvas_hw
        self.CLASSES = None
        self._predict = jax.jit(
            lambda v, im, sh, sf: detector_predict(
                detector, v, im, img_shapes=sh, scale_factors=sf,
                test_cfg=dict(cfg.model.get("test_cfg", {}) or {})))


def init_detector(config, checkpoint: str | None = None,
                  canvas_hw=None) -> DetectorBundle:
    if isinstance(config, str):
        config = Config.fromfile(config)
    if canvas_hw is None:           # config override beats the default
        canvas_hw = tuple(config.get("canvas_hw", DEFAULT_CANVAS))
    detector = build_detector(dict(config.model))
    imgs = jnp.zeros((1, *canvas_hw, 3), jnp.float32)
    from dsl_tpu.models.detectors.single_stage import init_detector_variables

    variables = init_detector_variables(detector, jax.random.PRNGKey(0), imgs)
    if checkpoint:
        from dsl_tpu.utils.checkpoint import load_checkpoint

        try:
            state_like, _meta = load_checkpoint(checkpoint, None)
        except Exception:
            state_like = None
        if isinstance(state_like, dict) and "params" in state_like:
            variables = {"params": state_like["params"],
                         "batch_stats": state_like.get("batch_stats", {})}
    return DetectorBundle(detector, variables, config, canvas_hw)


def inference_detector(bundle: DetectorBundle, img):
    """img: file path or BGR ndarray. Returns list per class of (n, 5)."""
    if isinstance(img, str):
        arr = cv2.imread(img, cv2.IMREAD_COLOR)
        if arr is None:
            raise FileNotFoundError(img)
    else:
        arr = img
    h, w = arr.shape[:2]
    ch, cw = bundle.canvas_hw
    factor = min(1344 / max(h, w), 800 / min(h, w))
    nw, nh = int(w * factor + 0.5), int(h * factor + 0.5)
    out = cv2.resize(arr, (nw, nh)).astype(np.float32)
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    out = (out[..., ::-1] - mean) / std
    canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:min(nh, ch), :min(nw, cw)] = out[:ch, :cw]
    sf = np.asarray([[nw / w, nh / h, nw / w, nh / h]], np.float32)
    shapes = np.asarray([[nh, nw]], np.float32)
    dets, labels, valid = bundle._predict(
        bundle.variables, jnp.asarray(canvas[None]), jnp.asarray(shapes),
        jnp.asarray(sf))
    dets = np.asarray(dets)[0][np.asarray(valid)[0]]
    labels = np.asarray(labels)[0][np.asarray(valid)[0]]
    num_classes = bundle.cfg.model["bbox_head"]["num_classes"]
    return [dets[labels == c] for c in range(num_classes)]


def show_result(img, result, score_thr=0.3, class_names=None,
                out_file=None, color=(0, 255, 0)):
    """Draw per-class results on the image (cv2)."""
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    img = img.copy()
    for cls_idx, dets in enumerate(result):
        for x1, y1, x2, y2, score in dets:
            if score < score_thr:
                continue
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                          color, 2)
            name = (class_names[cls_idx] if class_names else str(cls_idx))
            cv2.putText(img, f"{name}:{score:.2f}", (int(x1), int(y1) - 4),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    if out_file:
        cv2.imwrite(out_file, img)
    return img
