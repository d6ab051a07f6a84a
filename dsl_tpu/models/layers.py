"""Shared flax building blocks: convs, norms, scale — NHWC throughout.

NHWC is the TPU-native layout (channels on the 128-lane axis feeding the MXU);
the reference's NCHW tensors exist only because of cuDNN conventions.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

ModuleDef = Any


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always uses stored statistics (norm_eval=True semantics).

    Matches the reference's detection-time BN behavior: ``norm_eval=True``
    everywhere (``/root/reference/mmdet/models/backbones/resnet_rla.py:376-385``)
    so BN is an affine transform using ImageNet running stats. The affine
    scale/bias remain trainable parameters; mean/var live in the
    ``batch_stats`` collection and are imported from pretrained checkpoints.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((features,), jnp.float32))
        # fold stats in f32 for accuracy, then apply in the input's dtype —
        # a fixed f32 here would silently promote the whole bf16 backbone
        inv32 = (scale.astype(jnp.float32)
                 * jax.lax.rsqrt(var.value.astype(jnp.float32)
                                 + self.epsilon))
        shift32 = (bias.astype(jnp.float32)
                   - mean.value.astype(jnp.float32) * inv32)
        return x * inv32.astype(x.dtype) + shift32.astype(x.dtype)


def make_norm(norm_cfg: dict | None, name: str | None = None) -> nn.Module:
    """Build a norm layer from a ``dict(type=...)`` config.

    'BN' maps to FrozenBatchNorm (detection norm_eval semantics); 'GN' to
    GroupNorm; 'SyncBN' also maps to FrozenBatchNorm — cross-device stat sync
    is meaningless when stats are frozen, and XLA would handle a training-mode
    psum-BN inside the jitted step anyway.
    """
    norm_cfg = norm_cfg or dict(type="BN")
    t = norm_cfg.get("type", "BN")
    if t in ("BN", "SyncBN"):
        return FrozenBatchNorm(name=name)
    if t == "GN":
        return nn.GroupNorm(num_groups=norm_cfg.get("num_groups", 32),
                            epsilon=1e-5, name=name)
    raise ValueError(f"unknown norm type {t}")


class Scale(nn.Module):
    """Learnable per-level scalar multiplier (mmcv ``Scale``)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale",
                       nn.initializers.constant(self.init_value), ())
        return x * s


def conv3x3(features: int, stride: int = 1, dilation: int = 1,
            use_bias: bool = False, name: str | None = None,
            kernel_init=None) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=((dilation, dilation), (dilation, dilation)),
                   kernel_dilation=(dilation, dilation), use_bias=use_bias,
                   kernel_init=kernel_init or nn.initializers.he_normal(),
                   name=name)


def conv1x1(features: int, stride: int = 1, use_bias: bool = False,
            name: str | None = None, kernel_init=None) -> nn.Conv:
    return nn.Conv(features, (1, 1), strides=(stride, stride), padding="VALID",
                   use_bias=use_bias,
                   kernel_init=kernel_init or nn.initializers.he_normal(),
                   name=name)


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 max pool with pad 1 (torch ``MaxPool2d(3, 2, 1)`` semantics)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def normal_init(std: float = 0.01):
    return nn.initializers.normal(stddev=std)


def bias_init_with_prob(prior_prob: float) -> Callable:
    """Focal-loss classifier bias init: -log((1-p)/p)."""
    import math

    val = float(-math.log((1 - prior_prob) / prior_prob))
    return nn.initializers.constant(val)


class DropBlock(nn.Module):
    """DropBlock regularization (``mmdet/models/plugins/dropblock.py``):
    contiguous ``block_size`` x ``block_size`` feature regions are zeroed
    with a rate calibrated to ``drop_prob``; identity in eval mode."""

    drop_prob: float = 0.1
    block_size: int = 7

    @nn.compact
    def __call__(self, x, training: bool = False):
        if not training or self.drop_prob <= 0:
            return x
        import jax

        rng = self.make_rng("dropout")
        b, h, w, c = x.shape
        bs = min(self.block_size, h, w)
        gamma = (self.drop_prob * h * w / bs ** 2
                 / max((h - bs + 1) * (w - bs + 1), 1))
        seeds = jax.random.bernoulli(
            rng, gamma, (b, h - bs + 1, w - bs + 1, c)).astype(x.dtype)
        pad = [(0, 0), (bs - 1, bs - 1), (bs - 1, bs - 1), (0, 0)]
        mask = 1.0 - jax.lax.reduce_window(
            seeds, 0.0, jax.lax.max, (1, bs, bs, 1), (1, 1, 1, 1),
            [(0, 0)] + [(bs - 1, bs - 1)] * 2 + [(0, 0)])[
            :, :h, :w]
        keep = jnp.maximum(mask.mean(), 1e-6)
        return x * mask / keep


class NormedConv(nn.Module):
    """Conv with L2-normalized weights and inputs scaled by ``tempearture``
    (``mmdet/models/utils/normed_predictor.py`` NormedConv2d)."""

    features: int
    kernel_size: int = 1
    tempearture: float = 20.0

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param("kernel", nn.initializers.he_normal(),
                       (k, k, x.shape[-1], self.features))
        wn = w / jnp.sqrt((w ** 2).sum(axis=(0, 1, 2), keepdims=True) + 1e-6)
        xn = x / jnp.sqrt((x ** 2).sum(axis=-1, keepdims=True) + 1e-6)
        import jax.lax as lax

        y = lax.conv_general_dilated(
            xn, wn, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y * self.tempearture


class NormedLinear(nn.Module):
    """Dense layer with L2-normalized weights/inputs (Seesaw/LVIS heads)."""

    features: int
    tempearture: float = 20.0

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.he_normal(),
                       (x.shape[-1], self.features))
        wn = w / jnp.sqrt((w ** 2).sum(axis=0, keepdims=True) + 1e-6)
        xn = x / jnp.sqrt((x ** 2).sum(axis=-1, keepdims=True) + 1e-6)
        return (xn @ wn) * self.tempearture


class ContextBlock(nn.Module):
    """GCNet global-context block (mmcv ``context_block.py``; used by
    ``configs/gcnet``): attention-pooled global feature -> 1x1 bottleneck
    (LayerNorm+ReLU) -> channel-add back onto every position."""

    ratio: float = 1.0 / 4
    pooling_type: str = "att"        # 'att' | 'avg'
    fusion_types: Sequence[str] = ("channel_add",)

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        planes = max(int(c * self.ratio), 1)
        if self.pooling_type == "att":
            attn = nn.Conv(1, (1, 1), name="conv_mask")(x)     # (B,H,W,1)
            attn = jax.nn.softmax(attn.reshape(b, h * w, 1), axis=1)
            ctx = jnp.einsum("bpc,bpo->boc", x.reshape(b, h * w, c), attn)
            ctx = ctx.reshape(b, 1, 1, c)
        else:
            ctx = x.mean(axis=(1, 2), keepdims=True)

        def transform(name):
            t = nn.Conv(planes, (1, 1), name=f"{name}_conv1")(ctx)
            t = nn.LayerNorm(name=f"{name}_ln")(t)
            t = nn.relu(t)
            # zero-init the last conv: block starts as identity
            return nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           name=f"{name}_conv2")(t)

        out = x
        if "channel_mul" in self.fusion_types:
            out = out * jax.nn.sigmoid(transform("channel_mul"))
        if "channel_add" in self.fusion_types:
            out = out + transform("channel_add")
        return out
