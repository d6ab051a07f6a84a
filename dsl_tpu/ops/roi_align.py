"""RoIAlign / RoIPool in pure JAX (gather-based bilinear sampling).

TPU-native replacement for mmcv's CUDA ``roi_align``/``RoIPool``
(``/root/reference/mmdet`` §2.2: needed by the two-stage zoo tier and mask
targets). Semantics follow torchvision/mmcv ``aligned=True`` RoIAlign:
continuous coordinates with the half-pixel offset, ``sampling_ratio``
bilinear samples per bin averaged; ``sampling_ratio=-1`` derives it from the
roi size (ceil(roi_extent / out)).

Shapes are static: rois arrive as a fixed-capacity ``(N, 5)`` array
(``batch_idx, x1, y1, x2, y2``) with a validity mask; invalid rows produce
zeros. Gathers lower to efficient XLA dynamic-gathers; no kernel needed at
these sizes (7x7xC per roi).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear(features: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """Sample features (H, W, C) at continuous (y, x) points (...,)."""
    h, w = features.shape[:2]
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    v00 = features[y0, x0]
    v01 = features[y0, x1]
    v10 = features[y1, x0]
    v11 = features[y1, x1]
    return (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
            + v10 * ly * (1 - lx) + v11 * ly * lx)


def _roi_align_single(features: jnp.ndarray, roi: jnp.ndarray,
                      out_size: tuple[int, int], spatial_scale: float,
                      sampling_ratio: int, aligned: bool):
    """features: (H, W, C); roi: (4,) x1,y1,x2,y2 in image coords."""
    oh, ow = out_size
    offset = 0.5 if aligned else 0.0
    x1 = roi[0] * spatial_scale - offset
    y1 = roi[1] * spatial_scale - offset
    x2 = roi[2] * spatial_scale - offset
    y2 = roi[3] * spatial_scale - offset
    rw = jnp.maximum(x2 - x1, 1e-6 if aligned else 1.0)
    rh = jnp.maximum(y2 - y1, 1e-6 if aligned else 1.0)
    bin_w = rw / ow
    bin_h = rh / oh
    s = sampling_ratio if sampling_ratio > 0 else 2  # static grid under jit
    # sample grid: (oh, s) x (ow, s)
    iy = jnp.arange(oh)[:, None] * bin_h + (jnp.arange(s)[None, :] + 0.5) \
        * bin_h / s + y1                                       # (oh, s)
    ix = jnp.arange(ow)[:, None] * bin_w + (jnp.arange(s)[None, :] + 0.5) \
        * bin_w / s + x1                                       # (ow, s)
    yy = iy.reshape(-1)                                        # (oh*s,)
    xx = ix.reshape(-1)                                        # (ow*s,)
    grid_y = jnp.repeat(yy[:, None], len(xx), axis=1)          # (oh*s, ow*s)
    grid_x = jnp.repeat(xx[None, :], len(yy), axis=0)
    vals = _bilinear(features, grid_y, grid_x)                 # (oh*s, ow*s, C)
    c = vals.shape[-1]
    vals = vals.reshape(oh, s, ow, s, c)
    return vals.mean(axis=(1, 3))                              # (oh, ow, C)


@partial(jax.jit, static_argnames=("out_size", "spatial_scale",
                                  "sampling_ratio", "aligned"))
def roi_align(features: jnp.ndarray, rois: jnp.ndarray,
              out_size: tuple[int, int] = (7, 7),
              spatial_scale: float = 1.0, sampling_ratio: int = -1,
              aligned: bool = True,
              valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """RoIAlign over a batch of feature maps.

    Args:
      features: (B, H, W, C) NHWC.
      rois: (N, 5) rows ``(batch_idx, x1, y1, x2, y2)`` in image coords.
      valid: optional (N,) mask; invalid rows return zeros.

    Returns (N, oh, ow, C).
    """
    n = rois.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    batch_idx = jnp.clip(rois[:, 0].astype(jnp.int32), 0,
                         features.shape[0] - 1)
    per_roi_feats = features[batch_idx]                        # (N, H, W, C)

    def one(feat, roi):
        return _roi_align_single(feat, roi, out_size, spatial_scale,
                                 sampling_ratio, aligned)

    out = jax.vmap(one)(per_roi_feats, rois[:, 1:5])
    return jnp.where(valid[:, None, None, None], out, 0.0)


@partial(jax.jit, static_argnames=("out_size", "spatial_scale"))
def roi_pool(features: jnp.ndarray, rois: jnp.ndarray,
             out_size: tuple[int, int] = (7, 7),
             spatial_scale: float = 1.0,
             valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Max RoIPool (legacy op; dense-sampled max approximation with a 2x2
    grid per bin, matching integer-quantized RoIPool closely for typical
    detector scales)."""
    n = rois.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    batch_idx = jnp.clip(rois[:, 0].astype(jnp.int32), 0,
                         features.shape[0] - 1)
    per_roi_feats = features[batch_idx]
    oh, ow = out_size
    s = 2

    def one(feat, roi):
        x1 = roi[0] * spatial_scale
        y1 = roi[1] * spatial_scale
        x2 = roi[2] * spatial_scale
        y2 = roi[3] * spatial_scale
        bin_w = jnp.maximum(x2 - x1, 1.0) / ow
        bin_h = jnp.maximum(y2 - y1, 1.0) / oh
        iy = (jnp.arange(oh)[:, None] * bin_h
              + (jnp.arange(s)[None, :] + 0.5) * bin_h / s + y1)
        ix = (jnp.arange(ow)[:, None] * bin_w
              + (jnp.arange(s)[None, :] + 0.5) * bin_w / s + x1)
        yy = iy.reshape(-1)
        xx = ix.reshape(-1)
        gy = jnp.repeat(yy[:, None], len(xx), axis=1)
        gx = jnp.repeat(xx[None, :], len(yy), axis=0)
        vals = _bilinear(feat, gy, gx)
        c = vals.shape[-1]
        return vals.reshape(oh, s, ow, s, c).max(axis=(1, 3))

    out = jax.vmap(one)(per_roi_feats, rois[:, 1:5])
    return jnp.where(valid[:, None, None, None], out, 0.0)


@partial(jax.jit, static_argnames=("out_size", "spatial_scale",
                                  "sampling_ratio", "gamma"))
def deform_roi_align(features: jnp.ndarray, rois: jnp.ndarray,
                     offsets: jnp.ndarray,
                     out_size: tuple[int, int] = (7, 7),
                     spatial_scale: float = 1.0, sampling_ratio: int = -1,
                     gamma: float = 0.1,
                     valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Deformable RoI pooling (mmcv ``ops/deform_roi_pool`` CUDA kernel
    semantics, used by the reference's ``dcn/*_dpool/_mdpool`` configs):
    RoIAlign where every output bin's sampling points are shifted by a
    learned per-bin offset, scaled by ``gamma`` times the roi extent.

    Args:
      features: (B, H, W, C) NHWC.
      rois: (N, 5) ``(batch_idx, x1, y1, x2, y2)`` image coords.
      offsets: (N, oh, ow, 2) per-bin normalized ``(dx, dy)``; the actual
        shift is ``gamma * (roi_w, roi_h) * (dx, dy)`` feature-map pixels
        after ``spatial_scale``.
    Returns (N, oh, ow, C).
    """
    oh, ow = out_size
    n = rois.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    batch_idx = jnp.clip(rois[:, 0].astype(jnp.int32), 0,
                         features.shape[0] - 1)
    per_roi_feats = features[batch_idx]
    s = sampling_ratio if sampling_ratio > 0 else 2

    def one(feat, roi, off):
        x1 = roi[0] * spatial_scale - 0.5
        y1 = roi[1] * spatial_scale - 0.5
        x2 = roi[2] * spatial_scale - 0.5
        y2 = roi[3] * spatial_scale - 0.5
        rw = jnp.maximum(x2 - x1, 1e-6)
        rh = jnp.maximum(y2 - y1, 1e-6)
        bin_w = rw / ow
        bin_h = rh / oh
        # full (non-separable) grid: per-bin offsets break separability
        ii = jnp.arange(oh)[:, None, None, None]               # bin row
        jj = jnp.arange(ow)[None, :, None, None]               # bin col
        sy = jnp.arange(s)[None, None, :, None]
        sx = jnp.arange(s)[None, None, None, :]
        gy = y1 + (ii + (sy + 0.5) / s) * bin_h \
            + gamma * rh * off[:, :, None, None, 1]            # (oh,ow,s,s)
        gx = x1 + (jj + (sx + 0.5) / s) * bin_w \
            + gamma * rw * off[:, :, None, None, 0]
        vals = _bilinear(feat, gy, gx)                         # (oh,ow,s,s,C)
        return vals.mean(axis=(2, 3))

    out = jax.vmap(one)(per_roi_feats, rois[:, 1:5], offsets)
    return jnp.where(valid[:, None, None, None], out, 0.0)
