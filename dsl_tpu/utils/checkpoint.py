"""Checkpoint save/load for TrainState pytrees (orbax-backed).

The reference saves ``epoch_N.pth`` (student) + ``epoch_N.pth_ema`` (teacher)
via torch (``semi_epoch_based_runner.py:411-458``); here one orbax
PyTree checkpoint holds {student, teacher, opt, step} plus a JSON meta
sidecar — the TPU-idiomatic equivalent (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any

import jax
import numpy as np


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any, meta: dict | None = None) -> None:
    """Save a TrainState (or any pytree) under ``path`` (directory)."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(osp.abspath(path) + ".orbax",
                   _to_numpy_tree(state), force=True)
        ckptr.wait_until_finished()
        backend = "orbax"
    except Exception:  # pragma: no cover - fallback path
        flat, treedef = jax.tree_util.tree_flatten(_to_numpy_tree(state))
        os.makedirs(path + ".npz.d", exist_ok=True)
        np.savez(osp.join(path + ".npz.d", "arrays.npz"),
                 **{str(i): a for i, a in enumerate(flat)})
        backend = "npz"
    with open(path + ".meta.json", "w", encoding="utf-8") as f:
        json.dump({**(meta or {}), "backend": backend}, f)


def load_checkpoint(path: str, target: Any) -> tuple[Any, dict]:
    """Load into the structure of ``target``; returns (state, meta)."""
    meta = {}
    meta_path = path + ".meta.json"
    if osp.exists(meta_path):
        with open(meta_path, "r", encoding="utf-8") as f:
            meta = json.load(f)
    backend = meta.get("backend", "orbax")
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(osp.abspath(path) + ".orbax",
                              _to_numpy_tree(target))
    else:
        flat, treedef = jax.tree_util.tree_flatten(target)
        data = np.load(osp.join(path + ".npz.d", "arrays.npz"))
        state = jax.tree_util.tree_unflatten(
            treedef, [data[str(i)] for i in range(len(flat))])
    return state, meta
