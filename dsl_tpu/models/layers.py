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
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", self.scale_init, (features,))
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


def make_norm(norm_cfg: dict | None, name: str | None = None,
              zero_init: bool = False) -> nn.Module:
    """Build a norm layer from a ``dict(type=...)`` config.

    'BN' maps to FrozenBatchNorm (detection norm_eval semantics); 'GN' to
    GroupNorm; 'SyncBN' also maps to FrozenBatchNorm — cross-device stat sync
    is meaningless when stats are frozen, and XLA would handle a training-mode
    psum-BN inside the jitted step anyway. ``zero_init`` zero-inits the
    affine scale (mmdet ``zero_init_residual``/``zero_init_last_bn``:
    ``constant_init(norm3.weight, 0)`` on the block's last norm so every
    residual branch starts as identity).
    """
    norm_cfg = norm_cfg or dict(type="BN")
    t = norm_cfg.get("type", "BN")
    sinit = nn.initializers.zeros if zero_init else nn.initializers.ones
    if t in ("BN", "SyncBN"):
        return FrozenBatchNorm(name=name, scale_init=sinit)
    if t == "GN":
        return nn.GroupNorm(num_groups=norm_cfg.get("num_groups", 32),
                            epsilon=1e-5, scale_init=sinit, name=name)
    raise ValueError(f"unknown norm type {t}")


class Scale(nn.Module):
    """Learnable per-level scalar multiplier (mmcv ``Scale``)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale",
                       nn.initializers.constant(self.init_value), ())
        return x * s


class WSConv(nn.Module):
    """Weight-standardized convolution (mmcv ``ConvWS2d``,
    ``mmcv/cnn/bricks/conv_ws.py``): the kernel is standardized per OUTPUT
    channel — (mean, std) over (kh, kw, Cin) — before the convolution.
    Used by the reference's ``gn+ws`` config family. Std is the unbiased
    estimate (torch ``Tensor.std``), computed as sqrt(var + tiny) so the
    gradient stays bounded at zero spread (see CLAUDE.md jnp.std note)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    kernel_dilation: Sequence[int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = False
    eps: float = 1e-5
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel", self.kernel_init or nn.initializers.he_normal(),
            (kh, kw, cin, self.features))
        flat = kernel.reshape(-1, self.features)
        n = flat.shape[0]
        mean = jnp.mean(flat, axis=0)
        var = jnp.var(flat, axis=0) * (n / max(n - 1, 1))
        std = jnp.sqrt(var + 1e-12)
        kernel = (kernel - mean) / (std + self.eps)
        pad = (self.padding if isinstance(self.padding, str)
               else [tuple(p) for p in self.padding])
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=tuple(self.strides),
            padding=pad, rhs_dilation=tuple(self.kernel_dilation),
            feature_group_count=self.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,))
        return out


def _is_ws(conv_cfg: dict | None) -> bool:
    return bool(conv_cfg) and conv_cfg.get("type") in ("ConvWS", "ConvWS2d")


def make_conv(conv_cfg: dict | None, features: int, kernel_size,
              stride: int = 1, dilation: int = 1, use_bias: bool = False,
              groups: int = 1, padding=None, name: str | None = None,
              kernel_init=None):
    """nn.Conv, or WSConv when ``conv_cfg=dict(type='ConvWS')`` (mmcv
    build_conv_layer dispatch). Unknown conv types raise."""
    kh = kernel_size[0] if isinstance(kernel_size, (tuple, list)) \
        else kernel_size
    if padding is None:
        p = dilation * (kh - 1) // 2
        padding = "VALID" if p == 0 else ((p, p), (p, p))
    if conv_cfg and not _is_ws(conv_cfg):
        raise ValueError(f"unknown conv type {conv_cfg.get('type')!r}")
    cls = WSConv if _is_ws(conv_cfg) else nn.Conv
    return cls(features, (kh, kh), strides=(stride, stride), padding=padding,
               kernel_dilation=(dilation, dilation),
               feature_group_count=groups, use_bias=use_bias,
               kernel_init=kernel_init or nn.initializers.he_normal(),
               name=name)


def conv3x3(features: int, stride: int = 1, dilation: int = 1,
            use_bias: bool = False, name: str | None = None,
            kernel_init=None, conv_cfg: dict | None = None):
    return make_conv(conv_cfg, features, 3, stride, dilation, use_bias,
                     name=name, kernel_init=kernel_init)


def conv1x1(features: int, stride: int = 1, use_bias: bool = False,
            name: str | None = None, kernel_init=None,
            conv_cfg: dict | None = None):
    return make_conv(conv_cfg, features, 1, stride, use_bias=use_bias,
                     name=name, kernel_init=kernel_init)


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


class GeneralizedAttention(nn.Module):
    """Generalized spatial attention (``configs/empirical_attention``;
    "An Empirical Study of Spatial Attention Mechanisms in Deep Networks").

    Independent implementation from the paper (mmcv's
    ``generalized_attention.py`` is not vendored here): attention logits
    are the sum of the four factorized terms selected by
    ``attention_type`` bits —
      [0] query ⋅ key content, [1] query ⋅ relative-position embedding,
      [2] learned-bias ⋅ key (saliency), [3] learned-bias ⋅ position.
    The relative-position term is factorized additively over y and x (as
    in the reference), keys/values are ``kv_stride``-subsampled, and a
    zero-init output scale makes the block an identity at init.
    """

    num_heads: int = 8
    attention_type: str = "1111"
    kv_stride: int = 2
    spatial_range: int = -1          # -1 = global
    position_magnitude: float = 1.0

    def _pos_embed(self, rel, dim):
        """Sine features of scalar relative offsets: rel (N, M) -> (N, M, dim)."""
        half = dim // 2
        freq = jnp.power(100.0, -jnp.arange(half, dtype=jnp.float32) / half)
        ang = rel[..., None] * freq / self.position_magnitude
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)

    @nn.compact
    def __call__(self, x):
        bits = [c == "1" for c in self.attention_type]
        b, h, w, c = x.shape
        m = self.num_heads
        dk = max(c // m, 1)
        s = self.kv_stride
        kv = x[:, ::s, ::s]
        hk, wk = kv.shape[1], kv.shape[2]
        scale = dk ** -0.5

        # query projection only exists when a query-dependent term is on
        # (the reference instantiates it conditionally too)
        if bits[0] or bits[1]:
            q = nn.Conv(m * dk, (1, 1), use_bias=False, name="query_conv")(x)
            q = q.reshape(b, h, w, m, dk) * scale
        else:
            q = jnp.zeros((b, h, w, m, dk), jnp.float32)
        k = nn.Conv(m * dk, (1, 1), use_bias=False, name="key_conv")(kv)
        k = k.reshape(b, hk, wk, m, dk)
        v = nn.Conv(c, (1, 1), use_bias=False, name="value_conv")(kv)
        v = v.reshape(b, hk, wk, m, c // m)

        # content term(s): (q [+ bias]) . k  -> (B, m, H, W, Hk, Wk)
        logits = jnp.zeros((b, m, h, w, hk, wk), jnp.float32)
        qeff = q if bits[0] else jnp.zeros_like(q)
        if bits[2]:
            u = self.param("key_content_bias",
                           nn.initializers.normal(1.0 / dk ** 0.5), (m, dk))
            qeff = qeff + u[None, None, None]
        if bits[0] or bits[2]:
            logits = logits + jnp.einsum("bywmd,bvumd->bmywvu", qeff, k)

        # position term(s), additively factorized over y and x
        if bits[1] or bits[3]:
            pd = max(dk, 2)
            rel_y = (jnp.arange(h, dtype=jnp.float32)[:, None]
                     - jnp.arange(hk, dtype=jnp.float32)[None, :] * s)
            rel_x = (jnp.arange(w, dtype=jnp.float32)[:, None]
                     - jnp.arange(wk, dtype=jnp.float32)[None, :] * s)
            ry = nn.Dense(m * dk, use_bias=False, name="geom_fc_y")(
                self._pos_embed(rel_y, pd)).reshape(h, hk, m, dk)
            rx = nn.Dense(m * dk, use_bias=False, name="geom_fc_x")(
                self._pos_embed(rel_x, pd)).reshape(w, wk, m, dk)
            qg = q if bits[1] else jnp.zeros_like(q)
            if bits[3]:
                g = self.param("geom_bias",
                               nn.initializers.normal(1.0 / dk ** 0.5),
                               (m, dk))
                qg = qg + g[None, None, None]
            logits = logits + jnp.einsum(
                "bywmd,yvmd->bmywv", qg, ry)[..., None]
            logits = logits + jnp.einsum(
                "bywmd,wumd->bmywu", qg, rx)[..., None, :]

        if self.spatial_range > 0:
            # local attention window (reference ``spatial_range``)
            yy = jnp.abs(jnp.arange(h)[:, None] - jnp.arange(hk)[None] * s)
            xx = jnp.abs(jnp.arange(w)[:, None] - jnp.arange(wk)[None] * s)
            mask = (yy[:, None, :, None] <= self.spatial_range) \
                & (xx[None, :, None, :] <= self.spatial_range)
            logits = jnp.where(mask[None, None], logits, -1e9)

        attn = jax.nn.softmax(logits.reshape(b, m, h, w, hk * wk), axis=-1)
        out = jnp.einsum("bmywp,bpmd->bywmd", attn,
                         v.reshape(b, hk * wk, m, c // m))
        out = nn.Conv(c, (1, 1), name="proj_conv")(out.reshape(b, h, w, c))
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return x + gamma * out
