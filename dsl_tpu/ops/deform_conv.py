"""Deformable convolution v1/v2 in pure JAX (gather-based bilinear sampling).

TPU-native replacement for mmcv's CUDA ``DeformConv2d`` /
``ModulatedDeformConv2d`` (SURVEY.md §2.2: needed by the RepPoints/VFNet/
CenterNet-neck zoo tier). Instead of the CUDA im2col-with-offsets kernel,
each of the k·k kernel taps bilinear-samples the input at its offset grid
position (k² dense gathers that XLA fuses), then a 1×1 contraction applies
the kernel weights — mathematically identical to the reference op for
stride 1, the only configuration the zoo uses.

No dynamic shapes; offsets/masks are ordinary conv outputs so the whole op
jits and differentiates.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_map(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample x (B, H, W, C) at per-pixel continuous coords ys/xs (B, H, W).

    Out-of-bounds samples return 0 (the CUDA op's behavior)."""
    b, h, w, c = x.shape
    inb = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y = jnp.clip(ys, 0.0, h - 1.0)
    xq = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(xq).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0)[..., None]
    lx = (xq - x0)[..., None]
    bidx = jnp.arange(b)[:, None, None]
    v00 = x[bidx, y0, x0]
    v01 = x[bidx, y0, x1]
    v10 = x[bidx, y1, x0]
    v11 = x[bidx, y1, x1]
    out = (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
           + v10 * ly * (1 - lx) + v11 * ly * lx)
    return out * inb[..., None]


def deform_conv2d(x: jnp.ndarray, offsets: jnp.ndarray, weight: jnp.ndarray,
                  bias: jnp.ndarray | None = None,
                  mask: jnp.ndarray | None = None,
                  kernel_size: int = 3, dilation: int = 1,
                  stride: int = 1, deform_groups: int = 1) -> jnp.ndarray:
    """Deformable 3x3 (same padding) convolution.

    Args:
      x: (B, H, W, Cin) NHWC input.
      offsets: (B, H/s, W/s, dg·2·k²) per-tap (dy, dx) pairs, group-major
        then tap-major — ``[g0: dy0, dx0, dy1, dx1, ...][g1: ...]`` over
        taps in row-major kernel order, at the OUTPUT resolution.
      weight: (k, k, Cin, Cout) HWIO kernel.
      mask: optional (B, H/s, W/s, dg·k²) modulation (DCNv2); None = v1.
      stride: output positions every ``stride`` input pixels (mmcv
        ``stride`` — the ResNet-DCN stage-entry blocks use 2).
      deform_groups: input channels are split into ``dg`` blocks, each
        sampled with its own offset/mask group (mmcv ``deform_groups``,
        e.g. ``configs/dcn/*group4*``).
    Returns (B, H/s, W/s, Cout).
    """
    b, h, w, cin = x.shape
    k = kernel_size
    dg = deform_groups
    cpg = cin // dg
    pad = dilation * (k - 1) // 2
    oh, ow = offsets.shape[1], offsets.shape[2]
    gy = (jnp.arange(oh, dtype=x.dtype) * stride)[None, :, None]
    gx = (jnp.arange(ow, dtype=x.dtype) * stride)[None, None, :]
    cols = []
    for i in range(k):
        for j in range(k):
            t = i * k + j
            parts = []
            for g in range(dg):
                dy = offsets[..., (g * k * k + t) * 2]
                dx = offsets[..., (g * k * k + t) * 2 + 1]
                ys = gy + (i * dilation - pad) + dy
                xs = gx + (j * dilation - pad) + dx
                xg = x if dg == 1 else x[..., g * cpg:(g + 1) * cpg]
                vg = _bilinear_map(xg, ys, xs)           # (B, H, W, Cin/dg)
                if mask is not None:
                    vg = vg * mask[..., g * k * k + t:g * k * k + t + 1]
                parts.append(vg)
            v = parts[0] if dg == 1 else jnp.concatenate(parts, axis=-1)
            cols.append(v)
    col = jnp.stack(cols, axis=-2)                       # (B, H, W, k², Cin)
    if weight.shape[2] == cin:
        wmat = weight.reshape(k * k, cin, -1)            # (k², Cin, Cout)
        out = jnp.einsum("bhwki,kio->bhwo", col, wmat)
    else:
        # grouped deformable conv (ResNeXt + DCN): weight is
        # (k, k, Cin/g, Cout) with channels blocked by group
        g = cin // weight.shape[2]
        cg = weight.shape[2]
        colg = col.reshape(col.shape[:-1] + (g, cg))
        wmat = weight.reshape(k * k, cg, g, -1)          # (k², Cg, g, Co/g)
        out = jnp.einsum("bhwkgi,kigo->bhwgo", colg, wmat)
        out = out.reshape(out.shape[:-2] + (-1,))
    if bias is not None:
        out = out + bias
    return out


def sample_points(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Bilinear feature sampling at arbitrary per-pixel points — the
    primitive behind VFNet's star-shaped sampling and RepPoints.
    x: (B, H, W, C); ys/xs: (B, H, W, P) → (B, H, W, P, C)."""
    p = ys.shape[-1]
    outs = [_bilinear_map(x, ys[..., i], xs[..., i]) for i in range(p)]
    return jnp.stack(outs, axis=-2)
