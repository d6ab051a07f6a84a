#!/usr/bin/env python
"""Corruption-robustness evaluation.

Parity with ``/root/reference/tools/analysis_tools/test_robustness.py`` /
``robustness_eval.py``: evaluate under input corruptions at several
severities and report per-corruption mAP (mPC protocol subset). Corruptions
are implemented with numpy/cv2 (the reference uses imagecorruptions).
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import cv2


from dsl_tpu.data.pipelines.fillin_transforms import Corrupt

# Named corruption sets, parity with the reference CLI's choices
# (``test_robustness.py:102-110`` + imagecorruptions get_corruption_names).
CORRUPTION_SETS = {
    "benchmark": list(Corrupt.BENCHMARK),
    "all": list(Corrupt.SUPPORTED),
    "holdout": list(Corrupt.HOLDOUT),
    "noise": ["gaussian_noise", "shot_noise", "impulse_noise"],
    "blur": ["defocus_blur", "glass_blur", "motion_blur", "zoom_blur"],
    "weather": ["snow", "frost", "fog", "brightness"],
    "digital": ["contrast", "elastic_transform", "pixelate",
                "jpeg_compression"],
}


def corrupt(img: np.ndarray, name: str, severity: int) -> np.ndarray:
    """Apply one named corruption via the pipeline bank (severity 0 = clean)."""
    if severity == 0:
        return img
    out = Corrupt(name, severity)({"img": img})["img"]
    return np.clip(out, 0, 255).astype(np.uint8)


def expand_corruptions(names):
    out = []
    for n in names:
        out.extend(CORRUPTION_SETS.get(n, [n]))
    for n in out:
        if n not in Corrupt.SUPPORTED:
            raise ValueError(f"unknown corruption {n!r}")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--corruptions", nargs="+", default=["benchmark"])
    p.add_argument("--severities", nargs="+", type=int, default=[1, 3, 5])
    p.add_argument("--out", default="robustness.json")
    args = p.parse_args()
    args.corruptions = expand_corruptions(args.corruptions)

    import jax
    import jax.numpy as jnp

    from dsl_tpu.config import Config
    from dsl_tpu.apis.train import build_dataset
    from dsl_tpu.apis.test import single_device_test
    from dsl_tpu.models.detectors.single_stage import build_detector

    cfg = Config.fromfile(args.config)
    canvas = tuple(cfg.get("canvas_hw", (800, 1344)))
    detector = build_detector(dict(cfg.model))
    variables = detector.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 256, 256, 3), jnp.float32))
    if args.checkpoint:
        from dsl_tpu.utils.checkpoint import load_checkpoint

        loaded, _ = load_checkpoint(args.checkpoint, None)
        if isinstance(loaded, dict):
            variables = {"params": loaded.get("params"),
                         "batch_stats": loaded.get("batch_stats", {})}

    ds_cfg = {**dict(cfg.data.get("test", cfg.data.get("val"))),
              "test_mode": True}
    results = {}

    # monkey-patch the test image prep to corrupt after decode
    import dsl_tpu.apis.test as test_api

    orig_imread = cv2.imread

    for corruption in args.corruptions:
        for severity in args.severities:
            def patched(path, flag=cv2.IMREAD_COLOR,
                        _c=corruption, _s=severity):
                img = orig_imread(path, flag)
                return None if img is None else corrupt(img, _c, _s)

            cv2.imread = patched
            try:
                ds = build_dataset(ds_cfg)
                m = single_device_test(
                    detector, variables, ds,
                    test_cfg=dict(cfg.model.get("test_cfg", {}) or {}),
                    canvas_hw=canvas)
            finally:
                cv2.imread = orig_imread
            key = f"{corruption}@{severity}"
            results[key] = m
            print(key, {k: round(float(v), 4) for k, v in m.items()})

    maps = [m["bbox_mAP"] for m in results.values()]
    results["mPC"] = float(np.mean(maps)) if maps else 0.0
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"mPC = {results['mPC']:.4f}; wrote {args.out}")


if __name__ == "__main__":
    main()
