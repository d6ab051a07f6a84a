"""Transformer blocks for the DETR family (flax).

Parity with ``/root/reference/mmdet/models/utils/transformer.py`` +
``positional_encoding.py`` for the pieces DETR uses: sine positional
embedding, a post-norm encoder (self-attn) and decoder (self-attn +
cross-attn) with FFNs, returning every decoder layer's output for the
auxiliary losses.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


def sine_positional_encoding(mask: jnp.ndarray, num_feats: int = 128,
                             temperature: float = 10000.0,
                             normalize: bool = True,
                             scale: float = 2 * math.pi) -> jnp.ndarray:
    """(B, H, W) valid-pixel mask -> (B, H, W, 2*num_feats) sine embedding
    (reference SinePositionalEncoding)."""
    not_mask = mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = temperature ** (
        2 * (jnp.arange(num_feats) // 2) / num_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class FFN(nn.Module):
    embed_dim: int = 256
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Dense(self.ffn_dim, name="fc1")(x))
        return nn.Dense(self.embed_dim, name="fc2")(y)


class EncoderLayer(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, x, pos):
        q = k = x + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dim,
            name="self_attn")(q, k, x)
        x = nn.LayerNorm(name="norm1")(x + attn)
        x = nn.LayerNorm(name="norm2")(x + FFN(self.embed_dim, self.ffn_dim,
                                               name="ffn")(x))
        return x


class DecoderLayer(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, tgt, memory, query_pos, mem_pos):
        q = k = tgt + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dim,
            name="self_attn")(q, k, tgt)
        tgt = nn.LayerNorm(name="norm1")(tgt + attn)
        cross = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dim,
            name="cross_attn")(tgt + query_pos, memory + mem_pos, memory)
        tgt = nn.LayerNorm(name="norm2")(tgt + cross)
        tgt = nn.LayerNorm(name="norm3")(
            tgt + FFN(self.embed_dim, self.ffn_dim, name="ffn")(tgt))
        return tgt


class DetrTransformer(nn.Module):
    """Encoder-decoder; returns all decoder layers' outputs
    (B, L, Q, C) for DETR's auxiliary losses."""

    embed_dim: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, x, pos, query_embed):
        """x (B, HW, C) flattened features; pos (B, HW, C); query_embed
        (Q, C)."""
        b = x.shape[0]
        for i in range(self.num_encoder_layers):
            x = EncoderLayer(self.embed_dim, self.num_heads, self.ffn_dim,
                             name=f"enc{i}")(x, pos)
        q = query_embed[None].repeat(b, axis=0)            # (B, Q, C)
        tgt = jnp.zeros_like(q)
        outs = []
        for i in range(self.num_decoder_layers):
            tgt = DecoderLayer(self.embed_dim, self.num_heads, self.ffn_dim,
                               name=f"dec{i}")(tgt, x, q, pos)
            outs.append(nn.LayerNorm(name="post_norm")(tgt)
                        if i == self.num_decoder_layers - 1 else tgt)
        return jnp.stack(outs, axis=1)                     # (B, L, Q, C)
