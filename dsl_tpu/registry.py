"""Minimal name→constructor registries.

The reference uses mmcv's global mutable ``Registry`` +``build_from_cfg``
(``/root/reference/mmdet/models/builder.py:1-58``,
``mmdet/datasets/builder.py:25-26``). Here the same ``dict(type='X', ...)``
config surface is kept, but registries are plain per-domain maps with explicit
registration — no scope trees, no forced global state beyond the module-level
singletons below.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._map: dict[str, Callable] = {}

    @property
    def name(self) -> str:
        return self._name

    def __contains__(self, key: str) -> bool:
        return key in self._map

    def __len__(self) -> int:
        return len(self._map)

    def keys(self):
        return self._map.keys()

    def get(self, key: str) -> Callable | None:
        return self._map.get(key)

    def register(self, cls: Callable | None = None, *, name: str | None = None,
                 force: bool = False):
        """Use as ``@REG.register`` or ``@REG.register(name="X")``."""
        def _do(c: Callable) -> Callable:
            key = name or c.__name__
            if not force and key in self._map:
                raise KeyError(f"{key} already registered in {self._name}")
            self._map[key] = c
            return c

        if cls is None:
            return _do
        return _do(cls)

    # alias matching mmcv's decorator name so configs read familiarly
    register_module = register

    def __repr__(self) -> str:
        return f"Registry({self._name}, items={sorted(self._map)})"


def build_from_cfg(cfg: dict, registry: Registry, default_args: dict | None = None) -> Any:
    """Instantiate ``registry[cfg['type']](**cfg-minus-type, **default_args)``."""
    if not isinstance(cfg, dict) or "type" not in cfg:
        raise TypeError(f"cfg must be a dict with a 'type' key, got {cfg!r}")
    args = dict(cfg)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(
                f"{obj_type} is not registered in {registry.name}; "
                f"known: {sorted(registry.keys())}")
    elif inspect.isclass(obj_type) or callable(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be a str or callable, got {type(obj_type)}")
    if default_args:
        for k, v in default_args.items():
            args.setdefault(k, v)
    return obj_cls(**args)


# Domain singletons (models all share one registry, like mmdet's MODELS alias).
MODELS = Registry("models")
BACKBONES = MODELS
NECKS = MODELS
HEADS = MODELS
LOSSES = MODELS
DETECTORS = MODELS

DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")
HOOKS = Registry("hooks")
