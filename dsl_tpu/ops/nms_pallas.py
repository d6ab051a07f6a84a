"""Pallas TPU kernel: exact greedy NMS over score-sorted boxes.

Device-side replacement for the CUDA bitmask kernel
(``/root/reference/mmdet/ops/nms/src/nms_kernel.cu:1-130``). Design for the
TPU memory/compute model:

- boxes live in VMEM as four ``(1, N)`` coordinate rows (lane axis = boxes,
  N padded to a multiple of 128) — every suppression step is an 8x128-lane
  VPU op over all N boxes at once;
- the greedy recurrence runs as a ``fori_loop`` over boxes in score order,
  updating the keep row in place: exact greedy semantics in one pass, no
  O(N^2) IoU matrix in HBM (the XLA fallback in ``dsl_tpu/core/nms.py``
  materializes one);
- scalar per-step coordinates are read from VMEM with dynamic slices.

``pallas_nms_keep`` returns the keep mask for boxes already sorted by
descending score; `dsl_tpu.core.nms.nms` wires it in on TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _nms_kernel(boxes_ref, valid_ref, thr_ref, keep_ref):
    """boxes_ref: (8, N) rows x1,y1,x2,y2 (rows 4-7 unused); valid_ref,
    keep_ref: (1, N) float32 {0,1}; thr_ref: (1, 1) SMEM scalar."""
    n = boxes_ref.shape[1]
    keep_ref[:] = valid_ref[:]
    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (1, N)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    thr = thr_ref[0, 0]

    def body(i, _):
        # Mosaic forbids unaligned dynamic lane indexing; extract the pivot
        # box's scalars with masked full-lane reductions instead (pure VPU).
        sel = (col == i).astype(jnp.float32)            # (1, N) one-hot
        k_i = jnp.sum(keep_ref[:] * sel)                # pivot keep flag
        bx1 = jnp.sum(x1 * sel)
        by1 = jnp.sum(y1 * sel)
        bx2 = jnp.sum(x2 * sel)
        by2 = jnp.sum(y2 * sel)
        barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
        ix1 = jnp.maximum(x1, bx1)
        iy1 = jnp.maximum(y1, by1)
        ix2 = jnp.minimum(x2, bx2)
        iy2 = jnp.minimum(y2, by2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = jnp.maximum(area + barea - inter, 1e-10)
        iou = inter / union
        suppress = jnp.logical_and(jnp.logical_and(iou > thr, col > i),
                                   k_i > 0.5)
        keep_ref[:] = jnp.where(suppress, 0.0, keep_ref[:])
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_nms_keep(boxes_sorted: jnp.ndarray, valid_sorted: jnp.ndarray,
                    iou_threshold: float, interpret: bool = False):
    """Keep mask (bool (N,)) for score-desc sorted (N, 4) boxes."""
    n = boxes_sorted.shape[0]
    n_pad = _round_up(max(n, 128), 128)
    rows = jnp.zeros((8, n_pad), jnp.float32)
    rows = rows.at[0:4, :n].set(boxes_sorted.T.astype(jnp.float32))
    valid = jnp.zeros((1, n_pad), jnp.float32)
    valid = valid.at[0, :n].set(valid_sorted.astype(jnp.float32))
    thr = jnp.full((1, 1), iou_threshold, jnp.float32)

    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows, valid, thr)
    return keep[0, :n] > 0.5
