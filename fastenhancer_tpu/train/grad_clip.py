"""Gradient clipping over param pytrees (reference: utils/grad_clip.py).

Modes (selected by `train.clip_grad`, reference: wrappers/ns.py:64-73):
  "norm" / "norm_global" — clip by the global L2 norm (torch clip_grad_norm_).
  "norm_local"           — clip each tensor by its own norm, no global sync
                           (reference: utils/grad_clip.py:7-32).
  "value"                — elementwise clamp (torch clip_grad_value_).
All are pure jit-safe tree transforms.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

Array = jax.Array


def global_norm(tree) -> Array:
    leaves = [jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree)]
    return jnp.sqrt(sum(leaves))


def clip_grad_norm(grads, max_norm: float, eps: float = 1e-6):
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + eps))
    return jax.tree.map(lambda g: g * scale, grads), norm


def clip_grad_norm_local(grads, max_norm: float, eps: float = 1e-6):
    def clip_one(g):
        n = jnp.sqrt(jnp.sum(jnp.square(g)))
        return g * jnp.minimum(1.0, max_norm / (n + eps))
    return jax.tree.map(clip_one, grads), global_norm(grads)


def clip_grad_value(grads, clip_value: float):
    return (jax.tree.map(lambda g: jnp.clip(g, -clip_value, clip_value), grads),
            global_norm(grads))


def make_clipper(
    mode: tp.Optional[str], kwargs: tp.Optional[tp.Mapping[str, tp.Any]] = None
) -> tp.Callable:
    """Returns fn(grads) -> (clipped_grads, global_norm)."""
    kwargs = dict(kwargs or {})
    if mode is None:
        return lambda g: (g, global_norm(g))
    if mode in ("norm", "norm_global"):
        return lambda g: clip_grad_norm(g, **kwargs)
    if mode == "norm_local":
        return lambda g: clip_grad_norm_local(g, **kwargs)
    if mode == "value":
        return lambda g: clip_grad_value(g, **kwargs)
    raise ValueError(f"unsupported clip_grad mode {mode!r}")
