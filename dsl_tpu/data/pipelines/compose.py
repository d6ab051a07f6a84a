"""Pipeline composition (mmdet ``Compose`` equivalent,
``/root/reference/mmdet/datasets/pipelines/compose.py``)."""

from __future__ import annotations

from dsl_tpu.registry import PIPELINES, build_from_cfg


class Compose:
    def __init__(self, transforms):
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(build_from_cfg(t, PIPELINES))
            elif callable(t):
                self.transforms.append(t)
            else:
                raise TypeError(f"transform must be dict or callable: {t}")

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results

    def __repr__(self):
        return ("Compose(" +
                ", ".join(type(t).__name__ for t in self.transforms) + ")")


def test_pipeline_params(pipeline_cfg) -> dict:
    """Extract (img_scale, img_norm) from a test pipeline config
    (handles the MultiScaleFlipAug wrapper)."""
    img_scale = (1333, 800)
    img_norm = None
    stages = list(pipeline_cfg or [])
    for t in stages:
        t = dict(t)
        if t.get("type") == "MultiScaleFlipAug":
            if t.get("img_scale"):
                img_scale = tuple(t["img_scale"])
            stages = stages + list(t.get("transforms", []))
        elif t.get("type") == "Resize" and t.get("img_scale"):
            sc = t["img_scale"]
            img_scale = tuple(sc[0] if isinstance(sc[0], (list, tuple))
                              else sc)
        elif t.get("type") == "Normalize":
            img_norm = dict(mean=tuple(t["mean"]), std=tuple(t["std"]),
                            to_rgb=t.get("to_rgb", True))
    for t in stages:
        t = dict(t)
        if t.get("type") == "Normalize":
            img_norm = dict(mean=tuple(t["mean"]), std=tuple(t["std"]),
                            to_rgb=t.get("to_rgb", True))
    return dict(img_scale=img_scale, img_norm=img_norm)
