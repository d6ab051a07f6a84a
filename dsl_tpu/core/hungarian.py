"""Hungarian (bipartite) matching + DETR match costs.

Parity with ``/root/reference/mmdet/core/bbox/assigners/hungarian_assigner.py``
and ``mmdet/core/bbox/match_costs/match_cost.py`` (ClassificationCost,
BBoxL1Cost, IoUCost). The reference calls scipy's
``linear_sum_assignment`` on host per image; here the SAME algorithm
(successive shortest augmenting paths with dual potentials — scipy's
``_lsap.c``) runs ON DEVICE in pure ``lax`` loops, vmapped over the batch:
no host round-trip, no ``pure_callback`` (unsupported on some TPU
runtimes, and a per-step device→host sync on all of them). Exactness vs
scipy is pinned by the DETR/Deformable-DETR/Sparse R-CNN torch oracles and
``tests/test_hungarian_device.py`` (random rectangular instances).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

BIG = 1e8
INF = jnp.inf


def _lsa_device_single(cost: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Exact rectangular assignment on device.

    Assign each VALID gt column a distinct query row minimizing total cost.
    ``cost`` (Q, K) f32, ``valid`` (K,) bool -> assigned gt per query (Q,),
    -1 unmatched. Mirrors scipy ``_lsap.c`` with roles fixed as: the K gt
    columns are the scarce side (K <= Q), each getting one of Q rows.
    """
    q, k = cost.shape
    c = cost.astype(jnp.float32).T                    # (K, Q): per-gt rows

    def solve_col(state, j):
        u, v, gt4row, row4gt = state
        # Dijkstra from gt j over the Q rows for the shortest augmenting
        # path to a free row (scipy: sink search with dual-reduced costs).
        def dij_cond(s):
            _, _, _, sink, _, _ = s
            return sink < 0

        def dij_body(s):
            spc, path, sc, sink, i, minval = s
            # relax every unscanned row (query) through gt i
            r = minval + c[i] - u[i] - v
            unscanned = ~sc
            upd = (r < spc) & unscanned
            spc = jnp.where(upd, r, spc)
            path = jnp.where(upd, i, path)
            masked = jnp.where(unscanned, spc, INF)
            m = jnp.min(masked)
            # scipy tie-break: among equal-cost rows prefer a FREE one
            # (_lsap.c scans its `remaining` array the same way; only the
            # order AMONG several free ties differs — scipy's swap-removal
            # order vs first-index here — which picks between equally
            # optimal assignments on exactly-tied float costs)
            is_min = masked == m
            free_min = is_min & (gt4row < 0)
            jstar = jnp.where(free_min.any(), jnp.argmax(free_min),
                              jnp.argmax(is_min))
            minval = m
            sc = sc.at[jstar].set(True)                 # row scanned
            free = gt4row[jstar] < 0
            sink = jnp.where(free, jstar, -1)
            i = jnp.where(free, i, gt4row[jstar])
            return spc, path, sc, sink, i, minval

        spc0 = jnp.full((q,), INF, jnp.float32)
        path0 = jnp.full((q,), -1, jnp.int32)
        scanned0 = jnp.zeros((q,), bool)
        spc, path, scanned, sink, _, minval = jax.lax.while_loop(
            dij_cond, dij_body,
            (spc0, path0, scanned0, jnp.int32(-1), j, jnp.float32(0.0)))

        # dual updates (scipy _lsap.c: u[cur] += minVal; u[i in SR] +=
        # minVal - spc[col4row[i]]; v[j in SC] -= minVal - spc[j]).
        # SR \ {cur} = the holders of scanned occupied rows, and each such
        # gt's col4row is exactly the row it holds.
        scanned_taken = scanned & (gt4row >= 0)
        gt_of_scanned = jnp.where(scanned_taken, gt4row, 0)
        add = jnp.where(scanned_taken, minval - spc, 0.0)
        u = u.at[gt_of_scanned].add(add)
        u = u.at[j].add(minval)
        v = jnp.where(scanned, v - (minval - spc), v)

        # augment: walk predecessor links from the sink back to gt j
        def aug_cond(s):
            _, _, sink, done = s
            return ~done

        def aug_body(s):
            gt4row, row4gt, sink, _ = s
            i = path[sink]                              # gt feeding sink
            prev = row4gt[i]                            # row gt i held
            gt4row = gt4row.at[sink].set(i)
            row4gt = row4gt.at[i].set(sink)
            return gt4row, row4gt, prev, i == j

        gt4row, row4gt, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (gt4row, row4gt, sink, False))
        return (u, v, gt4row, row4gt), None

    def solve_col_gated(state, j):
        return jax.lax.cond(valid[j], lambda s: solve_col(s, j),
                            lambda s: (s, None), state)

    u0 = jnp.zeros((k,), jnp.float32)
    v0 = jnp.zeros((q,), jnp.float32)
    gt4row0 = jnp.full((q,), -1, jnp.int32)
    row4gt0 = jnp.full((k,), -1, jnp.int32)
    (u, v, gt4row, _), _ = jax.lax.scan(
        solve_col_gated, (u0, v0, gt4row0, row4gt0), jnp.arange(k))
    return gt4row


def hungarian_match(cost: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """Jittable exact matching, fully on device.

    Args: cost (B, Q, K) float32; gt_valid (B, K) bool.
    Returns assigned gt index per query (B, Q), -1 unmatched.
    """
    return jax.vmap(_lsa_device_single)(cost.astype(jnp.float32), gt_valid)


def hungarian_match_host(cost: jnp.ndarray,
                         gt_valid: jnp.ndarray) -> jnp.ndarray:
    """scipy reference path (host callback) — kept for cross-checking the
    device solver in tests; NOT used in the compute path."""
    def _lsa_batch(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
        from scipy.optimize import linear_sum_assignment

        b, q, k = cost.shape
        out = -np.ones((b, q), np.int32)
        for i in range(b):
            n = int(n_valid[i])
            if n == 0:
                continue
            rows, cols = linear_sum_assignment(cost[i, :, :n])
            out[i, rows] = cols
        return out

    n_valid = gt_valid.sum(axis=1).astype(jnp.int32)
    b, q, k = cost.shape
    return jax.pure_callback(
        _lsa_batch,
        jax.ShapeDtypeStruct((b, q), jnp.int32),
        cost.astype(jnp.float32), n_valid)


# -- match costs (mmdet match_cost.py semantics) -----------------------------


def classification_cost(cls_logits, gt_labels, weight: float = 1.0):
    """-softmax prob of the gt class (ClassificationCost)."""
    probs = jax.nn.softmax(cls_logits, axis=-1)        # (Q, C+1)
    return -probs[:, gt_labels] * weight               # (Q, K)


def bbox_l1_cost(pred_cxcywh, gt_cxcywh_norm, weight: float = 1.0):
    """L1 in normalized cxcywh space (BBoxL1Cost)."""
    return jnp.abs(pred_cxcywh[:, None, :]
                   - gt_cxcywh_norm[None, :, :]).sum(-1) * weight


def iou_cost(pred_xyxy, gt_xyxy, weight: float = 1.0):
    """-GIoU (IoUCost with iou_mode='giou')."""
    from dsl_tpu.core.boxes import bbox_overlaps

    return -bbox_overlaps(pred_xyxy, gt_xyxy, mode="giou") * weight


def focal_cost(cls_logits, gt_labels, weight: float = 1.0,
               alpha: float = 0.25, gamma: float = 2.0, eps: float = 1e-8):
    """FocalLossCost (``match_cost.py``): pos_cost - neg_cost at the gt
    class over sigmoid scores. cls_logits (Q, C), gt_labels (K,) -> (Q, K).
    """
    p = jax.nn.sigmoid(cls_logits)
    pos_cost = -((1 - p) ** gamma) * alpha * jnp.log(jnp.maximum(p, eps))
    neg_cost = -(p ** gamma) * (1 - alpha) * jnp.log(
        jnp.maximum(1 - p, eps))
    return (pos_cost[:, gt_labels] - neg_cost[:, gt_labels]) * weight
