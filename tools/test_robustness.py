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


def corrupt(img: np.ndarray, name: str, severity: int) -> np.ndarray:
    """A representative corruption bank (severity 1..5)."""
    s = severity
    rng = np.random.RandomState(severity)
    img = img.astype(np.float32)
    if name == "gaussian_noise":
        sigma = [8, 12, 18, 26, 38][s - 1]
        out = img + rng.randn(*img.shape) * sigma
    elif name == "shot_noise":
        lam = [60, 25, 12, 5, 3][s - 1]
        out = rng.poisson(np.clip(img, 0, 255) / 255.0 * lam) / lam * 255.0
    elif name == "gaussian_blur":
        k = [3, 5, 7, 9, 11][s - 1]
        out = cv2.GaussianBlur(img, (k, k), 0)
    elif name == "motion_blur":
        k = [5, 7, 9, 13, 17][s - 1]
        kernel = np.zeros((k, k), np.float32)
        kernel[k // 2] = 1.0 / k
        out = cv2.filter2D(img, -1, kernel)
    elif name == "brightness":
        out = img + [20, 35, 50, 65, 80][s - 1]
    elif name == "contrast":
        f = [0.75, 0.6, 0.45, 0.3, 0.2][s - 1]
        out = (img - img.mean()) * f + img.mean()
    elif name == "pixelate":
        f = [0.8, 0.65, 0.5, 0.4, 0.3][s - 1]
        h, w = img.shape[:2]
        small = cv2.resize(img, (max(1, int(w * f)), max(1, int(h * f))))
        out = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
    elif name == "jpeg_compression":
        q = [70, 50, 35, 20, 10][s - 1]
        ok, enc = cv2.imencode(".jpg", np.clip(img, 0, 255).astype(np.uint8),
                               [cv2.IMWRITE_JPEG_QUALITY, q])
        out = cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(np.float32)
    else:
        raise ValueError(name)
    return np.clip(out, 0, 255).astype(np.uint8)


CORRUPTIONS = ("gaussian_noise", "shot_noise", "gaussian_blur",
               "motion_blur", "brightness", "contrast", "pixelate",
               "jpeg_compression")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--corruptions", nargs="+", default=list(CORRUPTIONS))
    p.add_argument("--severities", nargs="+", type=int, default=[1, 3, 5])
    p.add_argument("--out", default="robustness.json")
    args = p.parse_args()

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
