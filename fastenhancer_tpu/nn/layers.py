"""Functional NN layers over plain param pytrees (nested dicts).

Design: every layer is a pure function `(params, x, ...) -> y`; parameters are
stored in torch tensor layouts (e.g. conv weight [out, in, k]) so that torch
checkpoint conversion and the deploy-time folding transforms are direct. The
apply functions transpose to TPU-friendly channels-last layouts internally.

Initializers match torch defaults bit-for-bit in distribution so that training
recipes transfer (kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +)).

Reference analogs: models/fastenhancer/default/model.py:15-126 (convs, BN),
torch.nn.{Linear,Conv1d,ConvTranspose1d,BatchNorm1d} semantics.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = tp.Dict[str, tp.Any]


# ---------------------------------------------------------------------------
# Initializers (torch-default distributions)
# ---------------------------------------------------------------------------

def uniform_init(key: Array, shape: tp.Sequence[int], bound: float) -> Array:
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def torch_linear_init(key: Array, out_f: int, in_f: int, bias: bool) -> Params:
    """nn.Linear default: kaiming_uniform(a=sqrt(5)) => U(+-1/sqrt(in))."""
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_f)
    p = {"weight": uniform_init(k_w, (out_f, in_f), bound)}
    if bias:
        p["bias"] = uniform_init(k_b, (out_f,), bound)
    return p


def torch_conv1d_init(
    key: Array, out_ch: int, in_ch: int, kernel: int, bias: bool, groups: int = 1
) -> Params:
    k_w, k_b = jax.random.split(key)
    fan_in = in_ch // groups * kernel
    bound = 1.0 / np.sqrt(fan_in)
    p = {"weight": uniform_init(k_w, (out_ch, in_ch // groups, kernel), bound)}
    if bias:
        p["bias"] = uniform_init(k_b, (out_ch,), bound)
    return p


def torch_convtranspose1d_init(
    key: Array, in_ch: int, out_ch: int, kernel: int, bias: bool, groups: int = 1
) -> Params:
    """nn.ConvTranspose1d weight layout: [in, out/groups, k]; fan_in uses out."""
    k_w, k_b = jax.random.split(key)
    fan_in = out_ch // groups * kernel
    bound = 1.0 / np.sqrt(fan_in)
    p = {"weight": uniform_init(k_w, (in_ch, out_ch // groups, kernel), bound)}
    if bias:
        p["bias"] = uniform_init(k_b, (out_ch,), bound)
    return p


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear(params: Params, x: Array) -> Array:
    """x: [..., in] @ weight[out, in].T (+ bias)."""
    y = x @ params["weight"].T
    if "bias" in params:
        y = y + params["bias"]
    return y


# ---------------------------------------------------------------------------
# Conv1d (channels-last compute layout)
# ---------------------------------------------------------------------------

def conv1d_cl(
    params: Params,
    x: Array,
    stride: int = 1,
    padding: tp.Union[int, tp.Tuple[int, int]] = 0,
    groups: int = 1,
) -> Array:
    """1-D conv over the length axis; x: [N, L, Cin] -> [N, L', Cout].

    Weight stays in torch layout [Cout, Cin/groups, K]; transposed to XLA
    [K, Cin/groups, Cout] ('NHC','HIO','NHC') which lowers onto the MXU.
    """
    w = jnp.transpose(params["weight"], (2, 1, 0))  # [K, Cin/g, Cout]
    if isinstance(padding, int):
        padding = (padding, padding)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=(padding,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if "bias" in params:
        y = y + params["bias"]
    return y


def conv_transpose1d_cl(
    params: Params,
    x: Array,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    groups: int = 1,
) -> Array:
    """1-D transposed conv; x: [N, L, Cin] ->
    [N, (L-1)*s + K - 2*pad + output_padding, Cout].

    Weight in torch layout [Cin, Cout/groups, K]. Implemented as the gradient
    of conv (matches torch semantics incl. `padding` meaning output trim and
    `output_padding` extending the right edge).
    """
    assert groups == 1, "grouped conv_transpose not needed by any model yet"
    # torch conv_transpose1d == conv with lhs_dilation=stride over the
    # spatially-flipped kernel, padding (k-1-pad) on each side.
    w = jnp.flip(jnp.transpose(params["weight"], (2, 0, 1)), axis=0)  # [K, Cin, Cout]
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=((k - 1 - padding, k - 1 - padding + output_padding),),
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if "bias" in params:
        y = y + params["bias"]
    return y


# ---------------------------------------------------------------------------
# BatchNorm (torch BatchNorm1d semantics; stats live in a separate tree)
# ---------------------------------------------------------------------------

def batch_norm(
    params: tp.Optional[Params],
    stats: Params,
    x: Array,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    weight: tp.Optional[Array] = None,
) -> tp.Tuple[Array, Params]:
    """Normalize over all axes except the last (channel) axis.

    Under pjit with the batch axis sharded, the means below are GLOBAL means
    (XLA inserts the cross-device reductions), so train-mode behavior equals
    the reference's SyncBatchNorm (reference: models/.../model.py:121-126).

    params: {"weight","bias"} or None (affine=False).
    stats:  {"mean","var"} running statistics (torch: unbiased var stored).
    weight: optional per-position inclusion weight broadcastable to
            x.shape[:-1] + (1,) — 0 excludes an element from the train-mode
            batch statistics (used to mask batch rows zero-padded for even
            device sharding; the reference never pads rows, so masked stats
            ARE the reference semantics). None = include everything.
    Returns (y, new_stats); new_stats == stats when train=False.

    Statistics and normalization always run in f32 regardless of the
    activation dtype (torch autocast keeps BN in fp32); the output is cast
    back to x.dtype.
    """
    c = x.shape[-1]
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if train:
        red = tuple(range(x.ndim - 1))
        if weight is None:
            mean = jnp.mean(xf, axis=red)
            var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
            n = x.size // c
            unbiased = var * (n / max(n - 1, 1))
        else:
            w = jnp.broadcast_to(weight.astype(jnp.float32),
                                 x.shape[:-1] + (1,))
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(xf * w, axis=red) / n
            var = jnp.sum(jnp.square(xf) * w, axis=red) / n - jnp.square(mean)
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        new_stats = {
            "mean": (1 - momentum) * stats["mean"] + momentum * mean,
            "var": (1 - momentum) * stats["var"] + momentum * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    y = (xf - mean) * inv
    if params is not None:
        y = y * params["weight"] + params["bias"]
    return y.astype(in_dtype), new_stats


def init_batch_norm(c: int, affine: bool = True) -> tp.Tuple[tp.Optional[Params], Params]:
    params = {"weight": jnp.ones(c), "bias": jnp.zeros(c)} if affine else None
    stats = {"mean": jnp.zeros(c), "var": jnp.ones(c)}
    return params, stats


def layer_norm_fc(params: tp.Optional[Params], x: Array,
                  eps: float = 1e-5) -> Array:
    """Normalize over the last TWO axes (freq, channel) with per-channel
    affine — the ln-ablation's LayerNorm / GroupNorm(1, C) semantics
    (reference: models/fastenhancer/ln/model.py:16-37, GroupNorm usage
    :427-509). Stats in f32, output in x.dtype."""
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(-2, -1), keepdims=True)
    diff = xf - mean
    var = jnp.mean(jnp.square(diff), axis=(-2, -1), keepdims=True)
    y = diff * jax.lax.rsqrt(var + eps)
    if params is not None:
        y = y * params["weight"] + params["bias"]
    return y.astype(in_dtype)


def init_layer_norm(c: int, affine: bool = True) -> tp.Optional[Params]:
    return {"weight": jnp.ones(c), "bias": jnp.zeros(c)} if affine else None


# ---------------------------------------------------------------------------
# Weight norm (torch parametrization: w = g * v / ||v||, norm over dims != 0)
# ---------------------------------------------------------------------------

def wn_weight(wn: Params, eps: float = 0.0) -> Array:
    """wn: {"g": [out, 1, ...], "v": same shape as weight} -> effective weight.

    Matches torch.nn.utils.parametrizations.weight_norm(dim=0): the norm is
    taken over every dim except 0. (reference: models/.../model.py:209-213)
    """
    v = wn["v"]
    dims = tuple(range(1, v.ndim))
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=dims, keepdims=True))
    return wn["g"] * v / (norm + eps)


def to_wn(weight: Array) -> Params:
    """Decompose a plain weight into {g, v} (torch weight_norm init)."""
    dims = tuple(range(1, weight.ndim))
    g = jnp.sqrt(jnp.sum(jnp.square(weight), axis=dims, keepdims=True))
    return {"g": g, "v": weight}


def maybe_wn_weight(params: Params, name: str = "weight") -> Array:
    """Fetch `params[name]`, resolving weight-norm {g,v} dicts transparently."""
    w = params[name]
    if isinstance(w, dict):
        return wn_weight(w)
    return w


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

_ACTIVATIONS: tp.Dict[str, tp.Callable[[Array], Array]] = {
    "ReLU": jax.nn.relu,
    "SiLU": jax.nn.silu,
    "GELU": jax.nn.gelu,
    "Tanh": jnp.tanh,
    "Sigmoid": jax.nn.sigmoid,
    "LeakyReLU": lambda x: jax.nn.leaky_relu(x, 0.01),
    "ELU": jax.nn.elu,
    "Identity": lambda x: x,
    "PReLU": None,  # parametric; handled by models that need it
}


def get_activation(name: str) -> tp.Callable[[Array], Array]:
    fn = _ACTIVATIONS.get(name)
    if fn is None:
        raise ValueError(f"unsupported activation: {name}")
    return fn
