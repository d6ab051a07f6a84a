"""Thin distributed-runtime module (multi-host entry points).

The TPU-native equivalent of the reference's ``torch.distributed`` surface
(SURVEY.md §1 / §2.2 NCCL row): ``init_dist`` maps to
``jax.distributed.initialize`` (no-op on single host), rank/world-size query
the JAX process topology, ``all_gather_objects`` replaces the tmpdir/GPU
result-collection of ``apis/test.py:117-190``, and ``reduce_mean`` exists
for host-side scalars (in-graph normalizer sync is just ``psum`` inside the
jitted step). Barriers are unnecessary — XLA program order and
``sync_global_devices`` cover the reference's ``dist.barrier()`` uses.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax


def init_dist(coordinator_address: str | None = None,
              num_processes: int | None = None,
              process_id: int | None = None) -> None:
    """Initialize the multi-host runtime. Safe no-op on a single host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def barrier(name: str = "barrier") -> None:
    """Cross-host sync (reference ``dist.barrier`` use sites)."""
    if get_world_size() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def all_gather_objects(obj: Any) -> list:
    """Gather a numeric pytree from every process (result collection).

    Returns a list of per-process objects with the same structure as
    ``obj`` (``process_allgather`` stacks a leading process axis per leaf;
    this splits it back)."""
    if get_world_size() <= 1:
        return [obj]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(obj)
    leaves, treedef = jax.tree_util.tree_flatten(gathered)
    n = get_world_size()
    return [jax.tree_util.tree_unflatten(treedef, [l[i] for l in leaves])
            for i in range(n)]


def reduce_mean(value: float) -> float:
    """Mean of a host scalar across processes (host-side analog of
    ``mmdet/core/utils/dist_utils.py:63-69``; in-graph code uses psum)."""
    vals = all_gather_objects(float(value))
    return float(np.mean(vals))
