"""AdamP optimizer math as pure per-leaf JAX functions.

AdamP (Heo et al., "AdamP: Slowing Down the Slowdown for Momentum Optimizers
on Scale-invariant Weights", ICLR 2021) removes the radial (norm-growing)
component of the update for scale-invariant weights by projecting the
perturbation onto the tangent space of the weight.

Re-derivation of the semantics of the reference's vendored copy
(reference: optim/adamp.py) in functional JAX. The torch version branches at
runtime on cosine similarity ("auto" mode); here both projections are
computed and selected with `jnp.where`, which is the XLA-idiomatic form of
the same decision (no data-dependent control flow under jit).

projection modes (reference: optim/adamp.py:42-57,137-158):
  "auto"        — project channelwise if |cos| < delta/sqrt(cols), else
                  layerwise if |cos| < delta/sqrt(numel), else no projection.
  "disabled"    — plain Adam(W)-style update.
  "channelwise" — always project per output channel (dim 0 rows).
  "layerwise"   — always project the flattened tensor.
  int d         — project over all dims except d.
"""
from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp

Array = jax.Array


def _channel_project(p2d: Array, perturb2d: Array, eps: float) -> Array:
    """Remove the component of perturb along each row of p. [C, L] each."""
    norm = jnp.linalg.norm(p2d, axis=1, keepdims=True)
    p_n = p2d / (norm + eps)
    proj = jnp.sum(p_n * perturb2d, axis=1, keepdims=True)
    return perturb2d - p_n * proj


def _layer_project(pf: Array, perturbf: Array, eps: float) -> Array:
    """Remove the component of perturb along the full flattened p. [L] each."""
    norm = jnp.linalg.norm(pf)
    p_n = pf / (norm + eps)
    return perturbf - p_n * jnp.sum(p_n * perturbf)


def _dim_project(p: Array, perturb: Array, keep_dim: int, eps: float) -> Array:
    dims = tuple(i for i in range(p.ndim) if i != keep_dim)
    if not dims:  # torch reduces over ALL dims when the dim list is empty
        dims = None
    norm = jnp.sqrt(jnp.sum(jnp.square(p), axis=dims, keepdims=True))
    p_n = p / (norm + eps)
    proj = jnp.sum(p_n * perturb, axis=dims, keepdims=True)
    return perturb - p_n * proj


def _abs_cos(x: Array, y: Array, axis: int, eps: float) -> Array:
    """|F.cosine_similarity|: |x.y| / max(||x||*||y||, eps) along axis."""
    dot = jnp.sum(x * y, axis=axis)
    den = jnp.linalg.norm(x, axis=axis) * jnp.linalg.norm(y, axis=axis)
    return jnp.abs(dot / jnp.maximum(den, eps))


def adamp_leaf_update(
    p: Array,
    g: Array,
    m: Array,
    v: Array,
    step: Array,  # scalar int (already incremented for this step)
    lr: Array,
    *,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    delta: float = 0.1,
    wd_ratio: float = 0.1,
    nesterov: bool = False,
    projection: tp.Union[str, int] = "auto",
) -> tp.Tuple[Array, Array, Array]:
    """One AdamP step for a single tensor. Returns (new_p, new_m, new_v).

    Mirrors reference optim/adamp.py:100-168: Adam moments -> perturbation ->
    optional tangent projection -> decoupled weight decay scaled by wd_ratio
    -> parameter step.
    """
    stepf = step.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** stepf
    bc2 = 1.0 - beta2 ** stepf

    m = beta1 * m + (1.0 - beta1) * g
    v = beta2 * v + (1.0 - beta2) * g * g
    denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
    step_size = lr / bc1
    if nesterov:
        perturb = (beta1 * m + (1.0 - beta1) * g) / denom
    else:
        perturb = m / denom

    ratio = jnp.asarray(1.0, p.dtype)
    if p.size == 1 or projection == "disabled":
        pass
    elif projection == "channelwise":
        x = p.reshape(p.shape[0], -1)
        perturb = _channel_project(x, perturb.reshape(x.shape), eps).reshape(p.shape)
        ratio = jnp.asarray(wd_ratio, p.dtype)
    elif projection == "layerwise":
        perturb = _layer_project(p.reshape(-1), perturb.reshape(-1), eps).reshape(p.shape)
        ratio = jnp.asarray(wd_ratio, p.dtype)
    elif isinstance(projection, int):
        perturb = _dim_project(p, perturb, projection, eps)
        ratio = jnp.asarray(wd_ratio, p.dtype)
    elif projection == "auto":
        pf, yf = p.reshape(-1), perturb.reshape(-1)
        use_layer = _abs_cos(pf, yf, 0, eps) < delta / math.sqrt(pf.size)
        layer_p = _layer_project(pf, yf, eps).reshape(p.shape)
        if p.ndim > 1:
            x = p.reshape(p.shape[0], -1)
            y = perturb.reshape(x.shape)
            cos = jnp.max(_abs_cos(x, y, 1, eps))
            use_chan = cos < delta / math.sqrt(x.shape[1])
            chan_p = _channel_project(x, y, eps).reshape(p.shape)
            perturb = jnp.where(use_chan, chan_p, jnp.where(use_layer, layer_p, perturb))
            projected = jnp.logical_or(use_chan, use_layer)
        else:
            perturb = jnp.where(use_layer, layer_p, perturb)
            projected = use_layer
        ratio = jnp.where(projected, jnp.asarray(wd_ratio, p.dtype), 1.0)
    else:
        raise ValueError(f"bad projection: {projection!r}")

    if weight_decay > 0:
        p = p * (1.0 - lr * weight_decay * ratio)
    p = p - step_size * perturb
    return p, m, v


def adamw_leaf_update(
    p: Array,
    g: Array,
    m: Array,
    v: Array,
    step: Array,
    lr: Array,
    *,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    **_unused,
) -> tp.Tuple[Array, Array, Array]:
    """torch.optim.AdamW semantics (decoupled decay applied before the step)."""
    stepf = step.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** stepf
    bc2 = 1.0 - beta2 ** stepf
    p = p * (1.0 - lr * weight_decay)
    m = beta1 * m + (1.0 - beta1) * g
    v = beta2 * v + (1.0 - beta2) * g * g
    denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
    p = p - (lr / bc1) * (m / denom)
    return p, m, v


def adam_leaf_update(
    p: Array, g: Array, m: Array, v: Array, step: Array, lr: Array,
    *, beta1: float = 0.9, beta2: float = 0.999, eps: float = 1e-8,
    weight_decay: float = 0.0, **_unused,
) -> tp.Tuple[Array, Array, Array]:
    """torch.optim.Adam semantics (L2 decay added to the gradient)."""
    if weight_decay > 0:
        g = g + weight_decay * p
    stepf = step.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** stepf
    bc2 = 1.0 - beta2 ** stepf
    m = beta1 * m + (1.0 - beta1) * g
    v = beta2 * v + (1.0 - beta2) * g * g
    denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
    p = p - (lr / bc1) * (m / denom)
    return p, m, v
