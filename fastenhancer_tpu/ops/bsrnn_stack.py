"""Fused Pallas kernel: BSRNN's whole LSTM layer stack for ONE streaming frame.

BSRNN's per-frame hot spot is its 6-layer dual-path stack (reference:
models/bsrnn/model.py:294-402): each layer runs a time-LSTM cell over
[B*bands] rows and then RE-SCANS the 31-band frequency axis with a
bidirectional LSTM — 6 x (1 + 31) sequential recurrence steps per frame.
Measured at 256 streams on v5e the stack costs ~870 of ~970 µs/frame under
XLA (ablation breakdown in docs/performance.md): each tiny step is a
separate HLO op whose issue latency, not FLOPs, sets the frame time —
the same regime the fused RNNFormer stack kernel (ops/rnnformer_stack.py)
beat by 1.6x.

This kernel runs the ENTIRE stack (time-LSTM cell, fc_time, the 31-step
bidirectional frequency sweep, fc_freq, both residuals, for every layer) as
ONE Pallas program with all weights and the loop state resident in VMEM.
Only the *folded* inference form is implemented (fold(): pre-norm BNs fused
into the LSTM input weights — reference deploy path models/bsrnn/model.py:
14-84); training keeps the composable XLA path.

Design notes:
  * Rows are FREQUENCY-MAJOR ([F, B] flattened) throughout the kernel, so a
    band's rows are one contiguous `pl.ds(f*tile, tile)` range — the
    bidirectional sweep needs zero in-kernel transposes (the fwd lane
    writes band f's rows, the bwd lane writes band F-1-f's rows, into the
    [fwd | bwd] lane halves of one [rows, 2H] buffer). The time cell is
    row-order-independent, so it runs on the same layout. The caller
    transposes activations b-major <-> f-major once per frame in XLA
    (cheap, fuses with the surrounding reshape).
  * The time cell's x/h projections stay two separate dots (merging into
    one [C+H, 4H] contraction needs a sub-128-lane concat relayout; the
    RNNFormer kernel measured merged matmuls slower for the same reason).
  * Gate math runs in f32 on the VPU (Mosaic rejects bf16 transcendentals;
    f32 is also what the XLA bf16 path effectively computes), matmuls
    accumulate f32 (`preferred_element_type`) and cast back to the
    activation dtype.
  * Streams are tiled over a Pallas grid in contiguous batch blocks
    (auto-sized to a VMEM byte budget); weights use whole-array VMEM specs
    — resident across grid steps, no per-step copy pipelining.
"""
from __future__ import annotations

import functools
import os
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
Params = tp.Dict[str, tp.Any]

_PLAN_KEYS = ("w_tih", "w_thh", "b_t", "w_fct", "b_fct",
              "w_fih", "b_fih", "w_fhh", "b_fhh", "w_fcf", "b_fcf")


# ---------------------------------------------------------------------------
# Plan: folded layer params -> stacked kernel-ready arrays
# ---------------------------------------------------------------------------

def plan_band_stack(layers: tp.Sequence[Params], dtype=None) -> Params:
    """Pack folded BSRNN layer params (Model.fold() output: norm_time /
    norm_freq already fused into the LSTM input weights) into stacked,
    pre-transposed arrays. Leading dim = layer index. dtype=None inherits
    the layers' own dtype."""
    l0 = layers[0]["rnn_time"]["weight_hh"]
    if dtype is None:
        dtype = l0.dtype
    h = int(np.asarray(l0).shape[1])          # hidden (2C)
    c = int(np.asarray(layers[0]["rnn_time"]["weight_ih"]).shape[1])

    def cat(fn):
        return jnp.stack([jnp.asarray(fn(p), dtype) for p in layers])

    def bias_or_zero(p, n):
        return p["bias"] if "bias" in p else np.zeros((n,), np.float32)

    return {
        # time cell: gates = x @ w_tih + h @ w_thh + b_t   (i,f,g,o lanes)
        "w_tih": cat(lambda p: p["rnn_time"]["weight_ih"].T),
        "w_thh": cat(lambda p: p["rnn_time"]["weight_hh"].T),
        "b_t": cat(lambda p: (p["rnn_time"]["bias_ih"]
                              + p["rnn_time"]["bias_hh"])[None]),
        "w_fct": cat(lambda p: p["fc_time"]["weight"].T),
        "b_fct": cat(lambda p: bias_or_zero(p["fc_time"], c)[None]),
        # freq sweep, per direction (0 = fwd, 1 = bwd)
        "w_fih": cat(lambda p: np.stack(
            [np.asarray(p["rnn_freq"][d]["weight_ih"]).T
             for d in ("fwd", "bwd")])),
        "b_fih": cat(lambda p: np.stack(
            [np.asarray(p["rnn_freq"][d]["bias_ih"])[None]
             for d in ("fwd", "bwd")])),
        "w_fhh": cat(lambda p: np.stack(
            [np.asarray(p["rnn_freq"][d]["weight_hh"]).T
             for d in ("fwd", "bwd")])),
        "b_fhh": cat(lambda p: np.stack(
            [np.asarray(p["rnn_freq"][d]["bias_hh"])[None]
             for d in ("fwd", "bwd")])),
        "w_fcf": cat(lambda p: p["fc_freq"]["weight"].T),
        "b_fcf": cat(lambda p: bias_or_zero(p["fc_freq"], c)[None]),
    }


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _mm(a: Array, w: Array) -> Array:
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _lstm_gates(gates: Array, c_prev: Array, hidden: int
                ) -> tp.Tuple[Array, Array]:
    """gates: f32 [rows, 4H] in torch (i, f, g, o) lane order."""
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    c_new = f * c_prev + i * g
    return o * jnp.tanh(c_new), c_new


def _band_stack_kernel(num_layers: int, n_bands: int, tile: int,
                       channels: int, hidden: int, *refs):
    (x_ref, h_ref, *plan_refs, x_out, h_out, xp_ref, ys_ref) = refs
    plan = dict(zip(_PLAN_KEYS, plan_refs))
    fb, c, hd = n_bands, channels, hidden
    rows = fb * tile
    x = x_ref[:].reshape(rows, c)
    dt = x.dtype

    for i in range(num_layers):
        # --- time-LSTM cell (one step; rows f-major, carry rows match) ---
        h_t = h_ref[i, 0].reshape(rows, hd)
        c_t = h_ref[i, 1].reshape(rows, hd).astype(jnp.float32)
        gates = (_mm(x, plan["w_tih"][i]) + _mm(h_t, plan["w_thh"][i])
                 + plan["b_t"][i].astype(jnp.float32))
        h_new, c_new = _lstm_gates(gates, c_t, hd)
        h_new = h_new.astype(dt)
        h_out[i, 0] = h_new.reshape(fb, tile, hd)
        h_out[i, 1] = c_new.astype(dt).reshape(fb, tile, hd)
        # --- fc_time + residual ---
        x = (_mm(h_new, plan["w_fct"][i])
             + plan["b_fct"][i].astype(jnp.float32)).astype(dt) + x

        # --- bidirectional frequency sweep over the bands ---
        # input projections for the whole sweep: one matmul per direction
        # (biases b_ih + b_hh both fold in here — LSTM adds them linearly)
        for d in range(2):
            xp_ref[d] = (_mm(x, plan["w_fih"][i, d])
                         + (plan["b_fih"][i, d]
                            + plan["b_fhh"][i, d]).astype(jnp.float32)
                         ).astype(dt).reshape(fb, tile, 4 * hd)
        w_fwd = plan["w_fhh"][i, 0][:]
        w_bwd = plan["w_fhh"][i, 1][:]

        def band_step(f, carry, w_fwd=w_fwd, w_bwd=w_bwd):
            hf, cf, hb, cb = carry                       # f32 [tile, hd]
            gf = (xp_ref[0, f].astype(jnp.float32)
                  + _mm(hf.astype(dt), w_fwd))
            gb = (xp_ref[1, fb - 1 - f].astype(jnp.float32)
                  + _mm(hb.astype(dt), w_bwd))
            hf_new, cf_new = _lstm_gates(gf, cf, hd)
            hb_new, cb_new = _lstm_gates(gb, cb, hd)
            # fwd fills band f's rows in the fwd lane half, bwd fills band
            # F-1-f's rows in the bwd lane half: after the loop ys_ref is
            # the torch-layout [fwd | bwd] concat with zero transposes
            ys_ref[pl.ds(f * tile, tile), :hd] = hf_new.astype(dt)
            ys_ref[pl.ds((fb - 1 - f) * tile, tile), hd:] = hb_new.astype(dt)
            return hf_new, cf_new, hb_new, cb_new

        zero = jnp.zeros((tile, hd), jnp.float32)
        jax.lax.fori_loop(0, fb, band_step, (zero, zero, zero, zero))
        # --- fc_freq + residual ---
        x = (_mm(ys_ref[:], plan["w_fcf"][i])
             + plan["b_fcf"][i].astype(jnp.float32)).astype(dt) + x

    x_out[:] = x.reshape(fb, tile, c)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

_TILE_BYTES_LIMIT = int(os.environ.get("BSRNN_STACK_TILE_BYTES", 90 << 20))


def _tile_align(itemsize: int) -> int:
    """The band sweep stores [tile, hd] rows at dynamic offset f*tile, which
    Mosaic must statically prove sublane-aligned — tile=4 fails with
    'cannot statically prove that index in dimension 0 is a multiple of 8'.
    The sublane tile is 8 for f32, 16 for bf16."""
    return 8 if itemsize >= 4 else 16


def _auto_batch_tile(b: int, fb: int, c: int, hd: int, num_layers: int,
                     itemsize: int, interpret: bool = False) -> int:
    """Largest aligned divisor of b whose per-program working set fits a
    VMEM byte budget (env-overridable: BSRNN_STACK_TILE_BYTES, read at
    import time — this runs at trace time, a post-compile env change would
    be silently ignored by the jit cache). Bigger tiles matter more here
    than for the RNNFormer kernel: the band sweep is a serial chain, so a
    grid of G programs runs G x (layers x bands) sequential steps — the
    measured bsrnn_s @ 256 streams frame drops 630 -> 539 us going from
    tile 64 to 256. Accounts h carries in+out, the xp/ys scratch, and one
    resident f32 gate buffer (Mosaic reuses the rest)."""
    align = 1 if interpret else _tile_align(itemsize)
    best = 0
    for tile in range(1, b + 1):
        if b % tile or tile % align:
            continue
        rows = fb * tile
        h_bytes = 2 * num_layers * 2 * rows * hd * itemsize   # in + out
        scratch = (2 * rows * 4 * hd + rows * 2 * hd) * itemsize
        gates = rows * 4 * hd * 4                             # f32, resident
        if h_bytes + scratch + gates > _TILE_BYTES_LIMIT:
            break
        best = tile
    if not best:
        raise ValueError(
            f"batch {b} has no {align}-aligned divisor that fits the fused "
            f"band-stack kernel (BSRNN_STACK_TILE_BYTES={_TILE_BYTES_LIMIT});"
            " use the XLA streaming path for small batches")
    return best


def supports_batch(b: int, fb: int, c: int, hd: int, num_layers: int,
                   itemsize: int, interpret: tp.Optional[bool] = None
                   ) -> bool:
    """True iff the kernel has a sublane-aligned batch tile for b that fits
    the VMEM budget (see _auto_batch_tile: alignment is 8 for f32 / 16 for
    bf16 on real TPU, 1 in interpret mode). Model.stream(fused_plan=...)
    consults this and falls back to the XLA scan body when False, so
    unaligned batches (e.g. 3) degrade gracefully instead of raising —
    same contract as ops/dprnn_stack.supports_batch."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    try:
        _auto_batch_tile(b, fb, c, hd, num_layers, itemsize, interpret)
        return True
    except ValueError:
        return False


@functools.partial(jax.jit,
                   static_argnames=("interpret", "batch_tile"))
def bsrnn_stack_step(
    plan: Params, x: Array, h: Array,
    interpret: tp.Optional[bool] = None,
    batch_tile: tp.Optional[int] = None,
) -> tp.Tuple[Array, Array]:
    """One fused streaming frame through every BSRNN layer.

    x: [F, B, C] frame activations in FREQUENCY-MAJOR layout (band_split
    output transposed once in XLA); h: [L, 2, F, B, H] stacked time-LSTM
    (h, c) carries in the same f-major row order -> (x_out [F, B, C],
    h_new like h). Exact same math as looping the folded layers through
    fnn.lstm / fnn.bilstm (tested). interpret=None auto-selects the Pallas
    interpreter off-TPU (CI/CPU)."""
    if interpret is None:  # axon == tunneled TPU; only pure CPU interprets
        interpret = jax.default_backend() == "cpu"
    fb, b, c = x.shape
    nl, _, _, _, hd = h.shape
    tile = (_auto_batch_tile(b, fb, c, hd, nl, x.dtype.itemsize, interpret)
            if batch_tile is None else batch_tile)
    if b % tile:
        raise ValueError(f"batch_tile {tile} does not divide batch {b}")
    kernel = functools.partial(_band_stack_kernel, nl, fb, tile, c, hd)

    def full(a: Array):
        del a
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    x_out, h_out = pl.pallas_call(
        kernel,
        grid=(b // tile,),
        out_shape=(jax.ShapeDtypeStruct((fb, b, c), x.dtype),
                   jax.ShapeDtypeStruct(h.shape, h.dtype)),
        in_specs=[
            pl.BlockSpec((fb, tile, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nl, 2, fb, tile, hd), lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            *[full(plan[k]) for k in _PLAN_KEYS],
        ],
        out_specs=(
            pl.BlockSpec((fb, tile, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nl, 2, fb, tile, hd), lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, fb, tile, 4 * hd), x.dtype),   # xp (both dirs)
            pltpu.VMEM((fb * tile, 2 * hd), x.dtype),     # ys [fwd | bwd]
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, h, *[plan[k] for k in _PLAN_KEYS])
    return x_out, h_out
