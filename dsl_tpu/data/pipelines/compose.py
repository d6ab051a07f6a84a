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
