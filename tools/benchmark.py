#!/usr/bin/env python
"""Inference FPS benchmark (reference parity:
``tools/analysis_tools/benchmark.py:51-122`` — CUDA-event bracketing becomes
a device→host fetch of the chained result, which is what actually
round-trips through the TPU relay).
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--shape", type=int, nargs=2, default=[800, 1344])
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--int8", action="store_true",
                   help="run the predict through the int8 PTQ transform "
                        "(utils/quantize.py; see docs/tutorials/export.md "
                        "for measured v5e tradeoffs)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dsl_tpu.models.detectors.single_stage import (
        build_detector, detector_predict, init_detector_variables)

    if args.config:
        from dsl_tpu.config import Config

        cfg = Config.fromfile(args.config)
        model_cfg = dict(cfg.model)
        test_cfg = dict(cfg.model.get("test_cfg", {}) or {})
    else:
        sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
        from __graft_entry__ import _flagship_detector

        det = _flagship_detector()
        model_cfg = None
        test_cfg = dict(nms_pre=1000, score_thr=0.05,
                        nms=dict(iou_threshold=0.6), max_per_img=100)
    if model_cfg is not None:
        det = build_detector(model_cfg)

    h, w = args.shape
    b = args.batch_size
    imgs = jnp.asarray(np.random.rand(b, h, w, 3), jnp.float32)
    # init_detector_variables is THE way to init any detector (flax init
    # only traces __call__ — RoI/mask/cascade subtrees need the merged
    # side inits); init at a small size (param shapes are resolution-
    # independent; a full-size init costs minutes through remote compile)
    init_hw = (min(h, 256), min(w, 256))
    variables = init_detector_variables(
        det, jax.random.PRNGKey(0),
        jnp.zeros((1, *init_hw, 3), jnp.float32))
    if args.checkpoint:
        from dsl_tpu.utils.checkpoint import load_checkpoint

        loaded, _ = load_checkpoint(args.checkpoint, None)
        if isinstance(loaded, dict) and "params" in loaded:
            variables = {"params": loaded["params"],
                         "batch_stats": loaded.get("batch_stats", {})}
    shapes = jnp.asarray(np.tile([[h, w]], (b, 1)), jnp.float32)
    sfs = jnp.ones((b, 4), jnp.float32)

    def _predict(v, im):
        return detector_predict(det, v, im, img_shapes=shapes,
                                scale_factors=sfs, test_cfg=test_cfg)

    if args.int8:
        from dsl_tpu.utils.quantize import calibrate_convs, quantize_convs

        fwd = lambda im: _predict(variables, im)
        scales = calibrate_convs(fwd, (imgs,))
        qfwd = jax.jit(quantize_convs(fwd, act_scales=scales))
        predict = lambda v, im: qfwd(im)
    else:
        predict = jax.jit(_predict)

    dets, labels, valid = predict(variables, imgs)
    _ = np.asarray(dets)  # compile + force
    for _ in range(args.warmup):
        dets, _, _ = predict(variables, imgs)
    _ = np.asarray(dets)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        dets, _, _ = predict(variables, imgs)
    _ = np.asarray(dets)
    dt = time.perf_counter() - t0
    fps = b * args.iters / dt
    print(f"inference: {fps:.2f} img/s ({dt / args.iters * 1000:.2f} "
          f"ms/iter, batch {b}, {h}x{w})")


if __name__ == "__main__":
    main()
