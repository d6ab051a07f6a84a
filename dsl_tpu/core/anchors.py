"""Anchor generation for anchor-based heads (RetinaNet/ATSS/SSD tier).

Parity with ``/root/reference/mmdet/core/anchor/anchor_generator.py`` for the
configurations the zoo uses: per-level base anchors from
``octave_base_scale``/``scales_per_octave`` (or explicit ``scales``) ×
``ratios``, centered at ``stride/2`` offsets, tiled over the feature grid.
Static feature sizes ⇒ anchors are trace-time numpy constants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class AnchorGenerator:
    def __init__(self, strides, ratios=(0.5, 1.0, 2.0), scales=None,
                 octave_base_scale=None, scales_per_octave=None,
                 base_sizes=None, center_offset=0.0):
        # each stride may be an int or an (sx, sy) pair (mmdet semantics)
        self.strides = [tuple(s) if isinstance(s, (tuple, list))
                        else (int(s), int(s)) for s in strides]
        self.ratios = np.asarray(ratios, np.float32)
        if scales is not None:
            self.scales = np.asarray(scales, np.float32)
        elif octave_base_scale is not None and scales_per_octave is not None:
            octave_scales = np.asarray(
                [2 ** (i / scales_per_octave)
                 for i in range(scales_per_octave)], np.float32)
            self.scales = octave_scales * octave_base_scale
        else:
            self.scales = np.asarray([8.0], np.float32)
        self.base_sizes = list(base_sizes) if base_sizes is not None else \
            [min(s) for s in self.strides]
        self.center_offset = center_offset

    @property
    def num_base_anchors(self) -> int:
        return len(self.ratios) * len(self.scales)

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    def base_anchors(self, level: int) -> np.ndarray:
        """(A, 4) anchors centered at (offset*stride) for one level."""
        base = self.base_sizes[level]
        w = base * np.sqrt(1.0 / self.ratios)[:, None] * self.scales[None, :]
        h = base * np.sqrt(self.ratios)[:, None] * self.scales[None, :]
        w = w.reshape(-1)
        h = h.reshape(-1)
        cx = self.center_offset * self.strides[level][0]
        cy = self.center_offset * self.strides[level][1]
        return np.stack([cx - 0.5 * w, cy - 0.5 * h,
                         cx + 0.5 * w, cy + 0.5 * h], axis=-1)

    def grid_anchors_level(self, featmap_size, level: int) -> np.ndarray:
        """(H*W*A, 4) anchors for one level (row-major y, x, anchor)."""
        h, w = featmap_size
        sx, sy = self.strides[level]
        base = self.base_anchors(level)                  # (A, 4)
        xs = np.arange(w, dtype=np.float32) * sx
        ys = np.arange(h, dtype=np.float32) * sy
        xx, yy = np.meshgrid(xs, ys)
        shifts = np.stack([xx.ravel(), yy.ravel(),
                           xx.ravel(), yy.ravel()], axis=-1)  # (HW, 4)
        anchors = shifts[:, None, :] + base[None, :, :]       # (HW, A, 4)
        return anchors.reshape(-1, 4)

    def grid_anchors(self, featmap_sizes) -> list[jnp.ndarray]:
        assert len(featmap_sizes) == self.num_levels
        return [jnp.asarray(self.grid_anchors_level(sz, i))
                for i, sz in enumerate(featmap_sizes)]

    def flat_anchors(self, featmap_sizes) -> jnp.ndarray:
        return jnp.concatenate(self.grid_anchors(featmap_sizes), axis=0)

    def num_anchors(self, featmap_sizes) -> list[int]:
        return [h * w * self.num_base_anchors for h, w in featmap_sizes]
