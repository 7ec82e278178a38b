"""Fused Pallas kernel: the dprnn block stack for ONE streaming frame.

The dprnn ablation replaces the default block's frequency MHSA with a
bidirectional frequency GRU (reference: models/fastenhancer/dprnn/
model.py:132-246): per frame each block runs a causal time GRU over
[B*F] rows, then RE-SCANS the F-band frequency axis with a biGRU
(hidden C_frnn per direction) — NB x (1 + F) sequential recurrence steps
per frame. Under XLA each tiny step is a separate HLO op whose issue
latency, not FLOPs, sets the frame time — the same regime the
RNNFormer/BSRNN/DPT fused kernels beat (ops/rnnformer_stack.py,
ops/bsrnn_stack.py, ops/dpt_stack.py).

This kernel runs the ENTIRE stack (time-GRU cell, trnn_fc, the F-step
bidirectional frequency sweep, frnn_fc, both residuals, for every block)
as ONE Pallas program with all weights and the loop state resident in
VMEM. Structure follows ops/bsrnn_stack.py (the band sweep is the same
shape with GRU cells instead of LSTM):

  * Rows are FREQUENCY-MAJOR ([F, B] flattened) so a band's rows are one
    contiguous `pl.ds(f*tile, tile)` range — the bidirectional sweep needs
    zero in-kernel transposes (fwd writes band f's rows, bwd writes band
    F-1-f's rows, into the [fwd | bwd] lane halves of one [rows, 2H]
    buffer, torch bidirectional=True layout). The time cell is
    row-order-independent, so it runs on the same layout; the caller
    transposes activations b-major <-> f-major once per frame in XLA.
  * The sweep's input projections (x @ W_ih^T + b_ih, both directions) are
    hoisted out of the band loop as one matmul per direction — the loop
    body runs only the recurrent half. b_hh cannot fold into the hoisted
    projection (the n gate needs r * (h W_hn + b_hn)), so it rides the
    recurrent projection instead, exactly like nn/gru.py.
  * Gate math runs in f32 on the VPU, matmuls accumulate f32
    (`preferred_element_type`) and cast back to the activation dtype.
  * Streams are tiled over a Pallas grid in contiguous batch blocks
    (auto-sized to a VMEM byte budget); weights use whole-array VMEM specs.

Only the *folded* inference form is implemented (fold(): post-BNs merged
into the fcs, optional pre-norms into the GRU input weights — reference
deploy path models/fastenhancer/dprnn/model.py + default BN-fold math);
training keeps the composable XLA path.

MEASURED RESULT (v5e, dprnn_b @ 256 streams bf16, 30 s audio): the kernel
is exact (bit-identical to the XLA path on real hardware) but ~3% SLOWER
— 4.03e-5 vs 3.90e-5 per-stream RTF. Unlike the rnnformer/bsrnn/dpt
stacks, the dprnn XLA path already runs its bidirectional sweep as ONE
direction-stacked lax.scan (nn/gru.py bigru single-scan form), which XLA
pipelines across the scan's frames better than this kernel's serial
in-VMEM band sweep. Kept as an exact, parity-tested negative result (same
posture as ops/gru_scan.py); bench.py and the zoo table use the XLA path.
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

_PLAN_KEYS = ("w_xr", "w_hr", "b_r", "w_xz", "w_hz", "b_z",
              "w_xn", "w_hn", "b_xn", "b_hn", "w_tfc", "b_tfc",
              "w_fih", "b_fih", "w_fhh", "b_fhh", "w_ffc", "b_ffc")


# ---------------------------------------------------------------------------
# Plan: folded block params -> stacked kernel-ready arrays
# ---------------------------------------------------------------------------

def plan_dprnn_stack(blocks: tp.Sequence[Params], dtype=None) -> Params:
    """Pack folded dprnn rf_blocks params (Model.fold() output; weight-norm
    stripped, post-BNs merged into the fcs, pre-norms into the GRU input
    weights) into stacked, pre-transposed arrays. Leading dim = block
    index. dtype=None inherits the blocks' own dtype."""
    nb = len(blocks)
    w_hh0 = blocks[0]["trnn"]["weight_hh"]
    if isinstance(w_hh0, dict):  # {"g","v"} weight-norm tree
        raise ValueError("plan_dprnn_stack expects fold() output "
                         "(weight norm still present)")
    c = int(np.asarray(w_hh0).shape[1])
    if dtype is None:
        dtype = w_hh0.dtype

    def cat(fn):
        return jnp.stack([jnp.asarray(fn(b), dtype) for b in blocks])

    # time GRU, per-gate weights (torch gate order r, z, n); r/z biases
    # combine b_ih + b_hh, the n gate keeps them separate (r gates b_hn)
    plan = {}
    for j, g in enumerate(("r", "z", "n")):
        plan[f"w_x{g}"] = cat(
            lambda b: b["trnn"]["weight_ih"][j * c:(j + 1) * c].T)
        plan[f"w_h{g}"] = cat(
            lambda b: b["trnn"]["weight_hh"][j * c:(j + 1) * c].T)
        if g == "n":
            plan["b_xn"] = cat(lambda b: b["trnn"]["bias_ih"][2 * c:][None])
            plan["b_hn"] = cat(lambda b: b["trnn"]["bias_hh"][2 * c:][None])
        else:
            plan[f"b_{g}"] = cat(
                lambda b: (b["trnn"]["bias_ih"][j * c:(j + 1) * c]
                           + b["trnn"]["bias_hh"][j * c:(j + 1) * c])[None])

    def fc(name):
        zeros = np.zeros((c,), np.float32)
        return (cat(lambda b: b[name]["weight"].T),
                cat(lambda b: np.asarray(b[name].get("bias", zeros))[None]))

    plan["w_tfc"], plan["b_tfc"] = fc("trnn_fc")
    plan["w_ffc"], plan["b_ffc"] = fc("frnn_fc")

    # freq sweep, per direction (0 = fwd, 1 = bwd)
    plan["w_fih"] = cat(lambda b: np.stack(
        [np.asarray(b["frnn"][d]["weight_ih"]).T for d in ("fwd", "bwd")]))
    plan["b_fih"] = cat(lambda b: np.stack(
        [np.asarray(b["frnn"][d]["bias_ih"])[None] for d in ("fwd", "bwd")]))
    plan["w_fhh"] = cat(lambda b: np.stack(
        [np.asarray(b["frnn"][d]["weight_hh"]).T for d in ("fwd", "bwd")]))
    plan["b_fhh"] = cat(lambda b: np.stack(
        [np.asarray(b["frnn"][d]["bias_hh"])[None] for d in ("fwd", "bwd")]))
    return plan


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _mm(a: Array, w: Array) -> Array:
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _gru_gates(xp: Array, hh: Array, h_prev: Array, hidden: int) -> Array:
    """xp: f32 [rows, 3H] hoisted input projection (b_ih included);
    hh: f32 [rows, 3H] recurrent projection (b_hh included); torch gate
    order (r, z, n) — matches nn/gru.py gru_cell."""
    r = jax.nn.sigmoid(xp[:, :hidden] + hh[:, :hidden])
    z = jax.nn.sigmoid(xp[:, hidden:2 * hidden] + hh[:, hidden:2 * hidden])
    n = jnp.tanh(xp[:, 2 * hidden:] + r * hh[:, 2 * hidden:])
    return (1.0 - z) * n + z * h_prev


def _dprnn_stack_kernel(num_blocks: int, n_bands: int, tile: int,
                        channels: int, hidden: int, *refs):
    (x_ref, h_ref, *plan_refs, x_out, h_out, xp_ref, ys_ref) = refs
    plan = dict(zip(_PLAN_KEYS, plan_refs))
    fb, c, hd = n_bands, channels, hidden
    rows = fb * tile
    x = x_ref[:].reshape(rows, c)
    dt = x.dtype

    for i in range(num_blocks):
        # --- time GRU (one step; rows f-major, carry rows match) ---
        h = h_ref[i].reshape(rows, c)
        r = jax.nn.sigmoid(_mm(x, plan["w_xr"][i]) + _mm(h, plan["w_hr"][i])
                           + plan["b_r"][i].astype(jnp.float32))
        z = jax.nn.sigmoid(_mm(x, plan["w_xz"][i]) + _mm(h, plan["w_hz"][i])
                           + plan["b_z"][i].astype(jnp.float32))
        n = jnp.tanh(_mm(x, plan["w_xn"][i])
                     + plan["b_xn"][i].astype(jnp.float32)
                     + r * (_mm(h, plan["w_hn"][i])
                            + plan["b_hn"][i].astype(jnp.float32)))
        h_new = ((1.0 - z) * n + z * h.astype(jnp.float32)).astype(dt)
        h_out[i] = h_new.reshape(fb, tile, c)
        # --- trnn_fc (post-BN folded) + residual ---
        x = (_mm(h_new, plan["w_tfc"][i])
             + plan["b_tfc"][i].astype(jnp.float32)).astype(dt) + x

        # --- bidirectional frequency GRU sweep over the bands ---
        # hoisted input projections, one matmul per direction (b_ih only —
        # b_hh rides the recurrent projection: the n gate needs
        # r * (h W_hn + b_hn), see module docstring)
        for d in range(2):
            xp_ref[d] = (_mm(x, plan["w_fih"][i, d])
                         + plan["b_fih"][i, d].astype(jnp.float32)
                         ).astype(dt).reshape(fb, tile, 3 * hd)
        w_fwd = plan["w_fhh"][i, 0][:]
        w_bwd = plan["w_fhh"][i, 1][:]
        b_fwd = plan["b_fhh"][i, 0].astype(jnp.float32)
        b_bwd = plan["b_fhh"][i, 1].astype(jnp.float32)

        def band_step(f, carry, w_fwd=w_fwd, w_bwd=w_bwd,
                      b_fwd=b_fwd, b_bwd=b_bwd):
            hf, hb = carry                               # f32 [tile, hd]
            hhf = _mm(hf.astype(dt), w_fwd) + b_fwd
            hhb = _mm(hb.astype(dt), w_bwd) + b_bwd
            hf_new = _gru_gates(xp_ref[0, f].astype(jnp.float32), hhf, hf, hd)
            hb_new = _gru_gates(xp_ref[1, fb - 1 - f].astype(jnp.float32),
                                hhb, hb, hd)
            # fwd fills band f's rows in the fwd lane half, bwd fills band
            # F-1-f's rows in the bwd half: after the loop ys_ref is the
            # torch-layout [fwd | bwd] concat with zero transposes
            ys_ref[pl.ds(f * tile, tile), :hd] = hf_new.astype(dt)
            ys_ref[pl.ds((fb - 1 - f) * tile, tile), hd:] = hb_new.astype(dt)
            return hf_new, hb_new

        zero = jnp.zeros((tile, hd), jnp.float32)
        jax.lax.fori_loop(0, fb, band_step, (zero, zero))
        # --- frnn_fc (post-BN folded) + residual ---
        x = (_mm(ys_ref[:], plan["w_ffc"][i])
             + plan["b_ffc"][i].astype(jnp.float32)).astype(dt) + x

    x_out[:] = x.reshape(fb, tile, c)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

_TILE_BYTES_LIMIT = int(os.environ.get("DPRNN_STACK_TILE_BYTES", 90 << 20))


def _tile_align(itemsize: int) -> int:
    """The band sweep stores [tile, hd] rows at dynamic offset f*tile, which
    Mosaic must statically prove sublane-aligned (8 for f32, 16 for bf16) —
    same constraint as ops/bsrnn_stack.py."""
    return 8 if itemsize >= 4 else 16


def _auto_batch_tile(b: int, fb: int, c: int, hd: int, num_blocks: int,
                     itemsize: int, interpret: bool = False) -> int:
    """Largest aligned divisor of b whose per-program working set fits a
    VMEM byte budget (env-overridable: DPRNN_STACK_TILE_BYTES, read at
    import time — this runs at trace time, a post-compile env change would
    be silently ignored by the jit cache). The band sweep is a serial
    chain, so a grid of G programs runs G x (blocks x bands) sequential
    steps — prefer the biggest tile that fits (the bsrnn kernel measured
    tile 256 beating tile 64 by 1.17x for exactly this reason)."""
    align = 1 if interpret else _tile_align(itemsize)
    best = 0
    for tile in range(1, b + 1):
        if b % tile or tile % align:
            continue
        rows = fb * tile
        h_bytes = 2 * num_blocks * rows * c * itemsize        # h in + out
        scratch = (2 * rows * 3 * hd + rows * 2 * hd) * itemsize
        gates = rows * 3 * c * 4                              # f32, resident
        if h_bytes + scratch + gates > _TILE_BYTES_LIMIT:
            break
        best = tile
    if not best:
        raise ValueError(
            f"batch {b} has no {align}-aligned divisor that fits the fused "
            f"dprnn-stack kernel (DPRNN_STACK_TILE_BYTES={_TILE_BYTES_LIMIT});"
            " use the XLA streaming path for small batches")
    return best


def supports_batch(b: int, fb: int, c: int, hd: int, num_blocks: int,
                   itemsize: int, interpret: tp.Optional[bool] = None
                   ) -> bool:
    """True iff the kernel has a sublane-aligned batch tile for b that fits
    the VMEM budget (see _auto_batch_tile: alignment is 8 for f32 / 16 for
    bf16 on real TPU, 1 in interpret mode). Model.stream(fused_plan=...)
    consults this and falls back to the XLA scan body when False, so
    unaligned batches (e.g. 3) degrade gracefully instead of raising."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    try:
        _auto_batch_tile(b, fb, c, hd, num_blocks, itemsize, interpret)
        return True
    except ValueError:
        return False


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def dprnn_stack_step(
    plan: Params, x: Array, h: Array,
    interpret: tp.Optional[bool] = None,
    batch_tile: tp.Optional[int] = None,
) -> tp.Tuple[Array, Array]:
    """One fused streaming frame through every dprnn block.

    x: [F, B, C] frame activations in FREQUENCY-MAJOR layout (rf_pre output
    transposed once in XLA); h: [NB, F, B, C] stacked time-GRU carries in
    the same f-major row order -> (x_out [F, B, C], h_new like h). Exact
    same math as looping the folded blocks through fnn.gru / fnn.bigru
    (tested). interpret=None auto-selects the Pallas interpreter off-TPU
    (CI/CPU)."""
    if interpret is None:  # axon == tunneled TPU; only pure CPU interprets
        interpret = jax.default_backend() == "cpu"
    fb, b, c = x.shape
    nb = h.shape[0]
    hd = int(plan["w_fhh"].shape[-2])  # .shape is static under jit tracing
    tile = (_auto_batch_tile(b, fb, c, hd, nb, x.dtype.itemsize, interpret)
            if batch_tile is None else batch_tile)
    if b % tile:
        raise ValueError(f"batch_tile {tile} does not divide batch {b}")
    kernel = functools.partial(_dprnn_stack_kernel, nb, fb, tile, c, hd)

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
            pl.BlockSpec((nb, fb, tile, c), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            *[full(plan[k]) for k in _PLAN_KEYS],
        ],
        out_specs=(
            pl.BlockSpec((fb, tile, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, fb, tile, c), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, fb, tile, 3 * hd), x.dtype),   # xp (both dirs)
            pltpu.VMEM((fb * tile, 2 * hd), x.dtype),     # ys [fwd | bwd]
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, h, *[plan[k] for k in _PLAN_KEYS])
    return x_out, h_out
