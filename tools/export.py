#!/usr/bin/env python
"""Export a detector's inference function as a serialized StableHLO artifact.

The TPU-native answer to the reference's ONNX deployment path
(``tools/deployment/pytorch2onnx.py:1-300`` + ``mmdet/core/export/``): the
jitted ``detector_predict`` (preprocessed image in, fixed-size detections
out) is exported with ``jax.export`` — a versioned, backend-portable
StableHLO program with the weights baked in — plus a JSON sidecar with the
input spec and class names. ``--check`` reloads the artifact and verifies it
reproduces the live model's outputs.

Usage:
  python tools/export.py CONFIG [CHECKPOINT] --out model.stablehlo
      [--batch 1] [--canvas 800 1344] [--check]
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Export detector to StableHLO")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--canvas", type=int, nargs=2, default=None)
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and compare outputs")
    p.add_argument("--int8", action="store_true",
                   help="rewrite every conv to dynamic-range int8 "
                        "(utils/quantize.py; see docs/tutorials/export.md "
                        "for measured v5e throughput tradeoffs)")
    return p.parse_args()


def export_detector(cfg, variables=None, batch=1, canvas=(800, 1344),
                    int8=False):
    """Returns (serialized_bytes, meta_dict, reference_outputs_fn)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from dsl_tpu.models.detectors.single_stage import (
        build_detector, detector_predict, init_detector_variables)

    detector = build_detector(dict(cfg.model))
    if variables is None:
        variables = init_detector_variables(
            detector, jax.random.PRNGKey(0),
            jnp.zeros((1, *canvas, 3), jnp.float32))

    test_cfg = dict(cfg.model.get("test_cfg", {}) or {})

    def predict(images, img_shapes, scale_factors):
        return detector_predict(detector, variables, images,
                                img_shapes=img_shapes,
                                scale_factors=scale_factors,
                                test_cfg=test_cfg)

    if int8:
        from dsl_tpu.utils.quantize import quantize_convs

        predict = quantize_convs(predict)

    args = (jnp.zeros((batch, *canvas, 3), jnp.float32),
            jnp.zeros((batch, 2), jnp.float32),
            jnp.ones((batch, 4), jnp.float32))
    exported = jexport.export(jax.jit(predict))(*args)
    meta = dict(
        input_spec=dict(images=[batch, *canvas, 3], img_shapes=[batch, 2],
                        scale_factors=[batch, 4]),
        model_type=cfg.model.get("type"),
        num_classes=cfg.model.get("bbox_head", {}).get("num_classes"),
        quantized="int8-dynamic" if int8 else None,
        platforms=list(exported.platforms))
    return exported.serialize(), meta, (predict, args)


def main():
    args = parse_args()

    import numpy as np
    import jax

    from dsl_tpu.config import Config

    cfg = Config.fromfile(args.config)
    canvas = tuple(args.canvas or cfg.get("canvas_hw", (800, 1344)))

    variables = None
    if args.checkpoint:
        import jax.numpy as jnp
        from dsl_tpu.models.detectors.single_stage import (
            build_detector, init_detector_variables)
        from dsl_tpu.utils.checkpoint import load_checkpoint

        detector = build_detector(dict(cfg.model))
        variables = init_detector_variables(
            detector, jax.random.PRNGKey(0),
            jnp.zeros((1, *canvas, 3), jnp.float32))
        loaded, _ = load_checkpoint(args.checkpoint, None)
        if isinstance(loaded, dict) and "params" in loaded:
            variables = {"params": loaded["params"],
                         "batch_stats": loaded.get("batch_stats", {})}

    data, meta, (predict, ex_args) = export_detector(
        cfg, variables, batch=args.batch, canvas=canvas, int8=args.int8)
    out = args.out or (osp.splitext(args.config)[0] + ".stablehlo")
    with open(out, "wb") as f:
        f.write(data)
    with open(out + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(f"exported {len(data) / 1e6:.1f} MB StableHLO to {out}")

    if args.check:
        from jax import export as jexport

        reloaded = jexport.deserialize(open(out, "rb").read())
        got = reloaded.call(*ex_args)
        want = predict(*ex_args)
        for g, w in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-5)
        print("reload check OK: outputs match the live model")


if __name__ == "__main__":
    main()
