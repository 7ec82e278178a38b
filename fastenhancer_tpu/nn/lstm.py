"""LSTM for TPU: big input-projection matmul + lax.scan recurrence.

Same design as gru.py; gate order and equations match torch (i, f, g, o) so
converted checkpoints are bit-compatible (the reference's BSRNN baseline
uses cuDNN LSTM / LSTMCell, reference: models/bsrnn/model.py:249-317).
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = tp.Dict[str, tp.Any]


def init_lstm(key: Array, input_size: int, hidden_size: int) -> Params:
    ks = jax.random.split(key, 4)
    b = 1.0 / np.sqrt(hidden_size)
    u = lambda k, s: jax.random.uniform(k, s, jnp.float32, -b, b)  # noqa: E731
    return {
        "weight_ih": u(ks[0], (4 * hidden_size, input_size)),
        "weight_hh": u(ks[1], (4 * hidden_size, hidden_size)),
        "bias_ih": u(ks[2], (4 * hidden_size,)),
        "bias_hh": u(ks[3], (4 * hidden_size,)),
    }


def init_bilstm(key: Array, input_size: int, hidden_size: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fwd": init_lstm(k1, input_size, hidden_size),
            "bwd": init_lstm(k2, input_size, hidden_size)}


def lstm_cell(x_proj: Array, h: Array, c: Array, w_hh: Array, b_hh: Array
              ) -> tp.Tuple[Array, Array]:
    """x_proj: [N, 4H] = x W_ih^T + b_ih. Returns (h', c')."""
    gates = x_proj + h @ w_hh.T + b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm(
    params: Params, x: Array,
    hc0: tp.Optional[tp.Tuple[Array, Array]] = None,
    unroll: tp.Union[int, bool] = 8,
) -> tp.Tuple[Array, tp.Tuple[Array, Array]]:
    """x: [T, N, I] -> (y [T, N, H], (h_T, c_T)). unroll=True fully unrolls
    the scan (use for short static T, e.g. BSRNN's 30-band freq axis)."""
    t, n, _ = x.shape
    hidden = params["weight_hh"].shape[1]
    if hc0 is None:
        h0 = jnp.zeros((n, hidden), x.dtype)
        c0 = jnp.zeros((n, hidden), x.dtype)
    else:
        h0, c0 = hc0
    x_proj = x @ params["weight_ih"].T + params["bias_ih"]
    w_hh, b_hh = params["weight_hh"], params["bias_hh"]

    def step(carry, xp):
        h, c = carry
        h, c = lstm_cell(xp, h, c, w_hh, b_hh)
        return (h, c), h

    (h_t, c_t), ys = jax.lax.scan(step, (h0, c0), x_proj, unroll=unroll)
    return ys, (h_t, c_t)


def bilstm(params: Params, x: Array,
           unroll: tp.Union[int, bool] = 8) -> Array:
    """x: [T, N, I] -> [T, N, 2H] (torch bidirectional layout).

    Both directions run in ONE scan over direction-stacked rows (the bwd
    lane sees the flipped sequence), so a length-T sweep costs T sequential
    cell steps instead of 2T back-to-back scans. This is the per-frame
    latency lever for BSRNN-style models: their freq axis is re-scanned
    every streaming frame (reference models/bsrnn/model.py:353-402), so the
    recurrence chain — not FLOPs — bounds the streaming step."""
    t, n, _ = x.shape
    hidden = params["fwd"]["weight_hh"].shape[1]
    xx = jnp.stack([x, jnp.flip(x, axis=0)], axis=1)       # [T, 2, N, I]
    w_ih = jnp.stack([params["fwd"]["weight_ih"], params["bwd"]["weight_ih"]])
    w_hh = jnp.stack([params["fwd"]["weight_hh"], params["bwd"]["weight_hh"]])
    b_ih = jnp.stack([params["fwd"]["bias_ih"], params["bwd"]["bias_ih"]])
    b_hh = jnp.stack([params["fwd"]["bias_hh"], params["bwd"]["bias_hh"]])
    x_proj = jnp.einsum("tdni,dgi->tdng", xx, w_ih) + b_ih[:, None]

    def step(carry, xp):
        h, c = carry                                        # [2, N, H]
        gates = xp + jnp.einsum("dnh,dgh->dng", h, w_hh) + b_hh[:, None]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    zeros = jnp.zeros((2, n, hidden), x.dtype)
    _, ys = jax.lax.scan(step, (zeros, zeros), x_proj, unroll=unroll)
    return jnp.concatenate([ys[:, 0], jnp.flip(ys[:, 1], axis=0)], axis=-1)
