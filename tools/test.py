#!/usr/bin/env python
"""Evaluation / inference CLI (reference parity: ``tools/test.py``).

Usage:
  python tools/test.py CONFIG CHECKPOINT [--eval bbox] [--out results.json]
      [--format-only] [--cfg-options ...]

``--format-only`` writes COCO-format detection json (the pseudo-label
bootstrap path, §3.2) without computing metrics.
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from dsl_tpu.config import Config
from dsl_tpu.config.config import DictAction


def parse_args():
    p = argparse.ArgumentParser(description="Test a detector")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--eval", nargs="+", default=["bbox"])
    p.add_argument("--out", help="write raw results json here")
    p.add_argument("--format-only", action="store_true")
    p.add_argument("--ema", action="store_true",
                   help="evaluate the EMA (teacher) weights")
    p.add_argument("--cfg-options", nargs="+", action=DictAction)
    p.add_argument("--launcher", choices=["none", "jax", "slurm"],
                   default="none", help="multi-host init (see train.py)")
    return p.parse_args()


def main():
    args = parse_args()
    if getattr(args, "launcher", "none") != "none":
        import os as _os

        from dsl_tpu.parallel.dist import init_dist

        if args.launcher == "jax":
            init_dist(
                coordinator_address=_os.environ.get("COORDINATOR_ADDRESS"),
                num_processes=int(_os.environ.get("NUM_PROCESSES", "1")),
                process_id=int(_os.environ.get("PROCESS_ID", "0")))
        else:
            init_dist()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    import jax
    import jax.numpy as jnp

    from dsl_tpu.apis.train import build_dataset
    from dsl_tpu.apis.test import single_device_test
    from dsl_tpu.models.detectors.single_stage import build_detector

    from dsl_tpu.models.detectors.single_stage import init_detector_variables

    canvas = tuple(cfg.get("canvas_hw", (800, 1344)))
    detector = build_detector(dict(cfg.model))
    variables = init_detector_variables(
        detector, jax.random.PRNGKey(0),
        jnp.zeros((1, *canvas, 3), jnp.float32))
    if args.checkpoint:
        from dsl_tpu.utils.checkpoint import load_checkpoint
        from dsl_tpu.train.train_state import TrainState

        loaded, meta = load_checkpoint(args.checkpoint, None)
        if isinstance(loaded, dict):
            params = loaded.get("teacher_params" if args.ema else "params",
                                loaded.get("params"))
            variables = {"params": params,
                         "batch_stats": loaded.get("batch_stats", {})}

    test_cfg_data = cfg.data.get("test", cfg.data.get("val"))
    ds = build_dataset({**dict(test_cfg_data), "test_mode": True})

    from dsl_tpu.data.pipelines.compose import test_pipeline_params

    tp = test_pipeline_params(dict(test_cfg_data).get("pipeline"))
    results = single_device_test(
        detector, variables, ds,
        test_cfg=dict(cfg.model.get("test_cfg", {}) or {}),
        canvas_hw=canvas, evaluate=False, img_scale=tp["img_scale"],
        img_norm=tp["img_norm"])

    if args.out or args.format_only:
        dt = ds.results2json_bbox([r[:2] for r in results])
        out = args.out or (osp.splitext(args.checkpoint or "results")[0]
                           + ".bbox.json")
        with open(out, "w") as f:
            json.dump(dt, f)
        print(f"wrote {len(dt)} detections to {out}")
        if "segm" in args.eval and len(results[0]) > 2:
            sout = out.replace(".bbox.json", ".segm.json")
            with open(sout, "w") as f:
                json.dump(ds.results2json_segm(results), f)
            print(f"wrote segm results to {sout}")
    if not args.format_only:
        metrics = ds.evaluate(results, metric=(
            args.eval if len(results[0]) > 2 else "bbox"))
        print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
