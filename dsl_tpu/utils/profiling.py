"""Profiling utilities.

Parity with ``/root/reference/mmdet/utils/profiling.py:9-39``
(``profile_time``: CUDA-event + monotonic CPU bracketing) — on TPU the
equivalents are ``jax.profiler`` traces (Perfetto/XPlane) plus host-fetch
bracketing (through the remote relay ``block_until_ready`` is advisory; a
device→host transfer is the real barrier, see bench.py).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_time(name: str, stream=None, end_stream=None, logger=None):
    """Wall-clock bracketing context manager; forces pending device work by
    materializing ``stream`` (an array or pytree) if given."""
    import numpy as np
    import jax

    def _force(x):
        if x is None:
            return
        for leaf in jax.tree_util.tree_leaves(x):
            if hasattr(leaf, "shape"):
                np.asarray(leaf.ravel()[0] if leaf.size else leaf)

    _force(stream)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _force(end_stream)
        dt = (time.perf_counter() - t0) * 1000.0
        msg = f"{name}: {dt:.2f} ms"
        if logger is not None:
            logger.info(msg)
        else:
            print(msg)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (open with Perfetto / TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
