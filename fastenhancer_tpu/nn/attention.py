"""Frequency-axis multi-head self-attention.

The reference uses F.scaled_dot_product_attention over tiny frequency axes
(F ~ 16-96; reference: models/fastenhancer/default/model.py:129-152). At these
sizes flash-attention machinery is pointless on TPU — a plain einsum softmax
attention fuses fine under XLA.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from .layers import maybe_wn_weight, torch_linear_init

Array = jax.Array
Params = tp.Dict[str, tp.Any]


def init_attention(key: Array, channels: int, attn_bias: bool) -> Params:
    return {"qkv": torch_linear_init(key, channels * 3, channels, attn_bias)}


def attention(params: Params, x: Array, num_heads: int) -> Array:
    """x: [N, F, C] -> [N, F, C]. qkv weight [3C, C] (optionally weight-normed).

    Matches the reference's Attention.forward split convention: after the head
    reshape, the last dim is [q|k|v] concatenated per head.
    """
    n, f, c = x.shape
    w = maybe_wn_weight(params["qkv"], "weight")
    qkv = x @ w.T
    if "bias" in params["qkv"]:
        qkv = qkv + params["qkv"]["bias"]
    d = c // num_heads
    qkv = qkv.reshape(n, f, num_heads, 3 * d)
    q, k, v = qkv[..., :d], qkv[..., d: 2 * d], qkv[..., 2 * d:]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, x.dtype))
    logits = jnp.einsum("nfhd,nghd->nhfg", q, k) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nhfg,nghd->nfhd", probs, v)
    return out.reshape(n, f, c)
