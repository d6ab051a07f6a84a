"""Multi-level point generation for anchor-free heads.

Parity with the point grid used by FCOS
(``/root/reference/mmdet/models/dense_heads/anchor_free_head.py`` get_points /
``mmdet/core/anchor/point_generator.py:1-241``): a point at feature cell
(y, x) of a stride-s level sits at image coordinate
``(x * s + s // 2, y * s + s // 2)``.

Feature map sizes are static under jit, so points are computed with numpy at
trace time and become compile-time constants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class MlvlPointGenerator:
    def __init__(self, strides: list[int], offset: float = 0.5):
        self.strides = list(strides)
        self.offset = offset

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    def single_level_points(self, featmap_size: tuple[int, int], stride: int,
                            dtype=jnp.float32) -> jnp.ndarray:
        """(H*W, 2) points (x, y) in image coordinates, row-major over (y, x)."""
        h, w = featmap_size
        # integer `stride // 2` offset matches mmdet's `+ stride // 2`
        shift = int(stride * self.offset)
        x = np.arange(w, dtype=np.float32) * stride + shift
        y = np.arange(h, dtype=np.float32) * stride + shift
        xx, yy = np.meshgrid(x, y)
        pts = np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
        return jnp.asarray(pts, dtype=dtype)

    def grid_points(self, featmap_sizes: list[tuple[int, int]],
                    dtype=jnp.float32) -> list[jnp.ndarray]:
        assert len(featmap_sizes) == self.num_levels
        return [
            self.single_level_points(sz, s, dtype)
            for sz, s in zip(featmap_sizes, self.strides)
        ]

    def flat_points(self, featmap_sizes: list[tuple[int, int]],
                    dtype=jnp.float32) -> jnp.ndarray:
        """All levels concatenated: (sum HW, 2)."""
        return jnp.concatenate(self.grid_points(featmap_sizes, dtype), axis=0)

    def num_points(self, featmap_sizes: list[tuple[int, int]]) -> list[int]:
        return [h * w for h, w in featmap_sizes]
