"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL/DDP stack.

The reference syncs with ``torch.distributed`` (NCCL allreduce in DDP
backward, ``reduce_mean`` for loss normalizers, barriers around EMA/ckpt —
SURVEY.md §1, §2.3). Here all of that disappears into XLA: the train step is
jitted over a ``Mesh`` with the batch sharded on the ``data`` axis and
parameters replicated; gradient reduction and normalizer sync are collectives
XLA inserts, barriers are program order.

A ``model`` axis is reserved in the mesh so FSDP-style parameter sharding can
be layered on later without re-plumbing callers (SURVEY.md §2.3 note).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices: Sequence | None = None) -> Mesh:
    """Create a (data, model) mesh. Defaults to all devices on ``data``."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"need {n_data * n_model} devices, have {len(devices)}")
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over data; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# batch keys that carry traced hyperparameter STATE, not data — always
# replicated (Dynamic R-CNN schedule scalars, Seesaw class counts)
REPLICATED_BATCH_KEYS = frozenset(
    {"dyn_iou_thr", "dyn_beta", "cum_samples",
     "ghm_acc_sum", "ghm_r_acc_sum"})


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch pytree with the leading axis split over ``data``.

    Keys in :data:`REPLICATED_BATCH_KEYS` and rank-0 leaves are replicated
    (traced hyperparameter state); every other leaf must have a leading dim
    divisible by the data-axis size — a mis-sized batch fails loudly here
    rather than being silently replicated."""
    n = mesh.shape[DATA_AXIS]
    s = batch_sharding(mesh)
    r = replicated(mesh)

    def _put(path, x):
        names = {getattr(p, "key", None) for p in path}
        shape = getattr(x, "shape", ())
        if names & REPLICATED_BATCH_KEYS or len(shape) == 0:
            return jax.device_put(x, r)
        if shape[0] % n != 0:
            raise ValueError(
                f"batch leaf {path} leading dim {shape[0]} not divisible "
                f"by data axis {n}")
        return jax.device_put(x, s)

    return jax.tree_util.tree_map_with_path(_put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    n = mesh.shape[DATA_AXIS]
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def fsdp_sharding(mesh: Mesh, tree: Any, axis: str = DATA_AXIS,
                  min_size: int = 1024) -> Any:
    """ZeRO/FSDP-style sharding spec for a state pytree: each array is
    partitioned along its largest dimension divisible by the axis size
    (arrays smaller than ``min_size`` elements stay replicated — the
    all-gather latency would dominate their memory win). XLA inserts the
    gather/scatter collectives around use sites; this is the TPU-native
    counterpart of torch FSDP / ZeRO-3 parameter sharding.
    """
    n = mesh.shape[axis]

    def _spec(x):
        shape = getattr(x, "shape", ())
        if not shape or int(np.prod(shape)) < min_size:
            return NamedSharding(mesh, P())
        # largest divisible dim
        best, best_dim = -1, None
        for d, s in enumerate(shape):
            if s % n == 0 and s > best:
                best, best_dim = s, d
        if best_dim is None:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[best_dim] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(_spec, tree)


def shard_state_fsdp(mesh: Mesh, tree: Any, **kw) -> Any:
    """Place a state pytree with fsdp_sharding."""
    sh = fsdp_sharding(mesh, tree, **kw)
    return jax.tree_util.tree_map(jax.device_put, tree, sh)
