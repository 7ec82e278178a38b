"""Fused Pallas kernel: the whole RNNFormer block stack for ONE streaming frame.

The per-frame streaming hot spot is the K-block RNNFormer stack
(reference: models/fastenhancer/default/model.py:155-291) — measured ~160 of
~200 µs/frame at 256 streams under XLA (docs/performance.md). Under XLA each
block lowers to ~13 small ops whose per-op dispatch/relayout latency, not
FLOPs, sets the frame time. This kernel runs the *entire stack* (GRU
recurrence, post-GRU linear, positional embedding, masked-lane frequency
MHSA, attention linear, both residuals, for every block) as ONE Pallas
program with every weight and activation resident in VMEM.

Only the *folded* inference form is implemented (fold(): BN merged into the
linears, no pre-norms — reference deploy path models/.../model.py:532-608);
training keeps the composable XLA path.

Design notes (measured on v5e, see docs/performance.md):
  * Activations stay [B*F, C] (batch*freq rows, channel lanes); attention
    reshapes to [B, F, C] only for its two batched dots — Mosaic supports
    batch dims on `dot_general`.
  * Per-gate GRU weights are separate [C, C] matmuls (no sub-tile lane
    slicing); `x W + h W` pairs are fused into one [2C, C] contraction by
    concatenating x and h once per block.
  * Attention uses the same masked-lane head trick as nn/attention.py:
    K/V are expanded to [B, H*F, C] with per-head channel masks and the
    scores contract the full C lanes — bit-compatible with the head-dim
    einsum, no d=C/H-sized (sub-lane) dimensions anywhere.
  * The frame's softmax runs in f32; matmuls accumulate f32
    (`preferred_element_type`) and cast back to the activation dtype,
    matching what XLA does for the bf16 scan path.
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


# ---------------------------------------------------------------------------
# Plan: folded block params -> stacked kernel-ready arrays
# ---------------------------------------------------------------------------

def pad_freq(freq: int) -> int:
    """Frequency axis padding for the kernel's [.., F, ..] views.

    Empirical Mosaic envelope (measured on v5e over the whole fastenhancer
    family): natively 8-aligned freqs (16/24/48/64) compile fine, but
    f = 36 (16 kHz S, 48 kHz B) hangs the compile for tens of minutes, and
    so does padding it to 40 — while the identical shape at f = 48
    compiles in ~14 s. So: keep 8-aligned freqs as-is, round everything
    else up to a multiple of 16. Padded key positions are masked out of
    the softmax (kmask), padded query/GRU rows are junk-but-isolated and
    sliced off outside the kernel."""
    if freq % 8 == 0:
        return freq
    return -(-freq // 16) * 16


def plan_stack(blocks: tp.Sequence[Params], freq: int, num_heads: int,
               dtype=None, ln_eps: tp.Optional[float] = None) -> Params:
    """Pack folded rf_blocks params (Model.fold() output; weight-norm already
    stripped, post-norms merged into the fcs, no pre-norms) into stacked,
    pre-transposed arrays. Leading dim = block index. dtype=None inherits
    the blocks' own dtype (a mismatched f32 plan would silently promote the
    kernel's bf16 activations). Frequency-indexed arrays (pe, gmask, kmask)
    are built for pad_freq(freq).

    ln_eps selects the LN-ABLATION block form (models/fastenhancer/ln.py):
    the post-norms are sample-local LayerNorms over [F, C] that cannot fold
    into the fcs, so the kernel applies them inline. The fcs then carry no
    bias, and the plan gains wb_fc/wb_afc (the reference LN's quirky
    `diff + inv*weight*bias` affine term, precombined), an fmask excluding
    padded frequency rows from the LN statistics, and the eps itself."""
    nb = len(blocks)
    w_hh0 = blocks[0]["rnn"]["weight_hh"]
    if isinstance(w_hh0, dict):  # {"g","v"} weight-norm tree
        raise ValueError("plan_stack expects fold() output "
                         "(weight norm still present)")
    if dtype is None:
        dtype = w_hh0.dtype
    c = np.asarray(w_hh0).shape[1]

    def cat(fn):
        return jnp.stack([jnp.asarray(fn(b), dtype) for b in blocks])

    gates = {}
    for j, g in enumerate(("r", "z", "n")):
        gates[f"w_x{g}"] = cat(lambda b: b["rnn"]["weight_ih"][j * c:(j + 1) * c].T)
        gates[f"w_h{g}"] = cat(lambda b: b["rnn"]["weight_hh"][j * c:(j + 1) * c].T)
        if g == "n":
            gates["b_xn"] = cat(lambda b: b["rnn"]["bias_ih"][2 * c:][None])
            gates["b_hn"] = cat(lambda b: b["rnn"]["bias_hh"][2 * c:][None])
        else:
            gates[f"b_{g}"] = cat(
                lambda b: (b["rnn"]["bias_ih"][j * c:(j + 1) * c]
                           + b["rnn"]["bias_hh"][j * c:(j + 1) * c])[None])

    def fc(name):
        zeros = np.zeros((c,), np.float32)
        return (cat(lambda b: b[name]["weight"].T),
                cat(lambda b: np.asarray(b[name].get("bias", zeros))[None]))

    w_fc, b_fc = fc("rnn_fc")
    w_afc, b_afc = fc("attn_fc")

    # reference qkv row layout is per-head [q_h | k_h | v_h] (the head reshape
    # in nn/attention.py); gather rows into head-major q/k/v order so that
    # output lane h*d+t == head h, dim t — same order the masked-lane trick
    # assumes
    d = c // num_heads
    lane = np.arange(c)
    q_rows = (lane // d) * 3 * d + lane % d
    w_q = cat(lambda b: b["attn"]["qkv"]["weight"][q_rows].T)
    w_k = cat(lambda b: b["attn"]["qkv"]["weight"][q_rows + d].T)
    w_v = cat(lambda b: b["attn"]["qkv"]["weight"][q_rows + 2 * d].T)
    zeros = np.zeros((3 * c,), np.float32)
    b_qkv = cat(lambda b: np.asarray(b["attn"]["qkv"].get("bias", zeros)))
    b_q, b_k, b_v = (b_qkv[:, None, q_rows], b_qkv[:, None, q_rows + d],
                     b_qkv[:, None, q_rows + 2 * d])

    fp = pad_freq(freq)
    pe = jnp.zeros((nb, fp, c), dtype)
    for i, b in enumerate(blocks):
        if "pe" in b and b["pe"] is not None:
            pe = pe.at[i, :freq].set(jnp.asarray(b["pe"]["weight"], dtype))

    head_mask = (np.arange(c)[None, :] // d
                 == np.arange(num_heads)[:, None]).astype(np.float32)
    # per-head lane-group mask over the [H*Fp] folded score lanes (f32: it
    # feeds the f32 grouped-sum matmuls)
    gmask = (np.arange(num_heads * fp)[None, :] // fp
             == np.arange(num_heads)[:, None]).astype(np.float32)
    # additive key mask: padded frequency positions get -1e30 so their
    # softmax mass is exactly zero
    kmask = np.zeros((1, num_heads * fp), np.float32)
    kmask[0, (np.arange(num_heads * fp) % fp) >= freq] = -1e30

    plan = dict(gates, w_fc=w_fc, b_fc=b_fc, w_afc=w_afc, b_afc=b_afc,
                w_q=w_q, w_k=w_k, w_v=w_v, b_q=b_q, b_k=b_k, b_v=b_v,
                pe=pe, head_mask=jnp.asarray(head_mask, dtype),
                gmask=jnp.asarray(gmask, jnp.float32),
                kmask=jnp.asarray(kmask, jnp.float32))
    if ln_eps is not None:
        def wb(name):
            return cat(lambda b: (np.asarray(b[name]["ln"]["weight"])
                                  * np.asarray(b[name]["ln"]["bias"]))[None])

        # LN-statistics mask with the 1/(F*C) normalisation baked in, full
        # [1, fp, c] lanes (a lane-size-1 [1, fp, 1] operand aborts Mosaic's
        # layout inference — layout.h implicit_dim check, v5e)
        fmask = np.zeros((1, fp, c), np.float32)
        fmask[0, :freq, :] = 1.0 / (freq * c)
        plan["wb_fc"] = wb("rnn_post_norm")
        plan["wb_afc"] = wb("attn_post_norm")
        plan["fmask"] = jnp.asarray(fmask)
        # scalar operand -> SMEM (1, 1) (the guide's scalar convention; a
        # [1, 1] VMEM block is another degenerate layout)
        plan["ln_eps"] = jnp.full((1, 1), ln_eps, jnp.float32)
    return plan


_PLAN_KEYS = ("w_xr", "w_hr", "b_r", "w_xz", "w_hz", "b_z",
              "w_xn", "w_hn", "b_xn", "b_hn",
              "w_fc", "b_fc", "w_afc", "b_afc",
              "w_q", "w_k", "w_v", "b_q", "b_k", "b_v", "pe", "head_mask",
              "gmask", "kmask")


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _mm(a: Array, w: Array) -> Array:
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _bdot(a: Array, b: Array, contract: int, b_contract: int) -> Array:
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((contract,), (b_contract,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def freq_mhsa_lanes(x: Array, w_q: Array, w_k: Array, w_v: Array,
                    b_q: Array, b_k: Array, b_v: Array,
                    head_mask: Array, gmask: Array, kmask: Array,
                    batch: int, freq: int, channels: int,
                    num_heads: int) -> Array:
    """Masked-lane frequency MHSA on VMEM-resident values (one frame).

    x: [batch*freq, channels] -> attention output [batch*freq, channels] in
    concatenated-head layout (pre attn-fc). Shared by the RNNFormer stack
    kernel (this file) and the dptransformer stack kernel (ops/dpt_stack.py)
    — the freq-axis attention is identical in both block designs
    (reference: models/fastenhancer/{default,dptransformer}/model.py).
    See the inline notes for why heads fold into lanes."""
    b_, f, c = batch, freq, channels
    rows = b_ * f
    dt = x.dtype
    scale = 1.0 / np.sqrt(c // num_heads)
    q = (_mm(x, w_q) + b_q).astype(dt).reshape(b_, f, c)
    k = (_mm(x, w_k) + b_k).astype(dt).reshape(b_, f, c)
    v = (_mm(x, w_v) + b_v).astype(dt).reshape(b_, f, c)
    m = head_mask  # [H, C]
    # lane-folded heads: K/V expand to [B, H*F, C] with per-head channel
    # masks (nn/attention.py's masked-lane trick) so ONE batched dot
    # yields every head's scores side by side in lanes — Mosaic lowers
    # batched dots as per-batch-element loops, so folding H into lanes
    # quarters the loop count vs a head loop (measured 114 -> 94
    # us/frame for the stack). Masked V confines each head's output to
    # its own c lanes, so contracting the full H*F axis sums the heads
    # back into the concatenated-head layout exactly.
    kblk = jnp.concatenate(
        [k * m[hh][None, None, :] for hh in range(num_heads)], axis=1)
    vblk = jnp.concatenate(
        [v * m[hh][None, None, :] for hh in range(num_heads)], axis=1)
    logits = (_bdot(q, kblk, 2, 2) * scale
              + kmask[0][None, None, :])             # [B, F, H*F] f32
    # grouped softmax over each head's F-lane block. Stabilize with the
    # global row max (>= every group max; softmax is invariant to the
    # shift) and recover per-group denominators with two gmask matmuls
    # — replaces 2*H masked-reduction loops per block, which both
    # shrinks the unrolled Mosaic program (the L-shape compile went
    # pathological on it) and rides the MXU.
    gm = gmask.astype(jnp.float32)                   # [H, H*F]
    mx = jnp.max(logits, axis=-1, keepdims=True)     # [B, F, 1]
    p = jnp.exp(logits - mx)                         # padded keys -> 0
    den_g = jax.lax.dot_general(                     # [B, F, H]
        p, gm, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    den = jax.lax.dot_general(                       # [B, F, H*F]
        den_g, gm, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # global-max stabilization can underflow an entire group when one
    # head's logits sit >~100 nats below the row max (exp(x-mx) -> 0
    # for every lane of that group): clamp the denominator so the
    # division yields 0 (that head contributes nothing) instead of
    # 0/0 = NaN poisoning the carry. 1e-30 stays normal-range f32
    # (XLA CPU flushes subnormals). Outside that pathological regime
    # the clamp is inert and parity with the XLA path holds (~1e-7).
    probs = (p / jnp.maximum(den, 1e-30)).astype(dt)
    attn = _bdot(probs, vblk, 2, 1).astype(dt)       # [B, F, C]
    return attn.reshape(rows, c)


def stack_math(x, h_read, h_write, plan_vals, num_blocks: int,
               num_heads: int, batch: int, freq: int, channels: int,
               ln: bool = False):
    """The K-block RNNFormer stack for one frame, on VMEM-resident values.

    x: [batch*freq, channels] activations; h_read(i) -> [rows, c] carry;
    h_write(i, h_new) stores the new carry. plan_vals: dict of the plan
    arrays as VMEM refs (or arrays) — indexed lazily per block, exactly as
    the original single kernel did. Shared by the stack-only kernel below
    and the whole-frame kernel (ops/fused_frame.py). Returns x_out
    [rows, c].

    ln=True applies the LN-ablation's sample-local LayerNorm over [F, C]
    after each fc instead of relying on a folded BN bias (plan built with
    plan_stack(..., ln_eps=...)); padded frequency rows are excluded from
    the statistics via the plan's fmask."""
    (w_xr, w_hr, b_r, w_xz, w_hz, b_z, w_xn, w_hn, b_xn, b_hn,
     w_fc, b_fc, w_afc, b_afc, w_q, w_k, w_v, b_q, b_k, b_v, pe, head_mask,
     gmask, kmask) = [plan_vals[k] for k in _PLAN_KEYS]
    head_mask = head_mask[:]
    gmask = gmask[:]
    kmask = kmask[:]
    b_, f, c = batch, freq, channels  # freq == pad_freq(model freq)
    rows = b_ * f
    dt = x.dtype

    if ln:
        wb_fc, wb_afc = plan_vals["wb_fc"], plan_vals["wb_afc"]
        # fmask carries the 1/(F*C) normalisation and full [1, fp, c] lanes;
        # ln_eps is an SMEM (1, 1) scalar (degenerate lane-1 / [1, 1] VMEM
        # operands abort Mosaic layout inference — layout.h implicit_dim)
        fmask = plan_vals["fmask"][:].astype(jnp.float32)
        eps = plan_vals["ln_eps"][0, 0]

        def layer_norm(y, wb):
            """The reference ln-ablation LayerNorm, affine quirk included:
            out = diff + inv_std * (weight * bias) — the normalized diff is
            never scaled (models/fastenhancer/ln.py ref_layer_norm).

            Statistics as two chained single-axis keepdims sums — a fused
            axis=(1, 2) reduction aborts Mosaic's layout inference
            (layout.h implicit_dim, v5e), and routing the lane-sum through
            an all-ones MXU matmul loses ~1e-2 relative accuracy (f32
            matmuls run as bf16 passes). VPU sums are exact f32."""
            y3 = y.astype(jnp.float32).reshape(b_, f, c)
            s2 = jnp.sum(y3 * fmask, axis=2, keepdims=True)   # [tile, f, 1]
            mean = jnp.sum(s2, axis=1, keepdims=True)         # [tile, 1, 1]
            diff = y3 - mean
            v2 = jnp.sum(jnp.square(diff) * fmask, axis=2, keepdims=True)
            var = jnp.sum(v2, axis=1, keepdims=True)
            wb3 = wb.astype(jnp.float32).reshape(1, 1, c)
            out = diff + jax.lax.rsqrt(var + eps) * wb3
            return out.reshape(rows, c).astype(dt)

    for i in range(num_blocks):
        # --- time GRU (one step; torch gate order r,z,n) ---
        # VPU math stays f32 (Mosaic rejects bf16 transcendentals; f32 is
        # also what the XLA bf16 path effectively computes for these)
        h = h_read(i)
        r = jax.nn.sigmoid(_mm(x, w_xr[i]) + _mm(h, w_hr[i])
                           + b_r[i].astype(jnp.float32))
        z = jax.nn.sigmoid(_mm(x, w_xz[i]) + _mm(h, w_hz[i])
                           + b_z[i].astype(jnp.float32))
        nn = jnp.tanh(_mm(x, w_xn[i]) + b_xn[i].astype(jnp.float32)
                      + r * (_mm(h, w_hn[i]) + b_hn[i].astype(jnp.float32)))
        h_new = ((1.0 - z) * nn + z * h.astype(jnp.float32)).astype(dt)
        h_write(i, h_new)
        # --- post-GRU linear (BN folded / LN inline) + residual ---
        y = (_mm(h_new, w_fc[i]) + b_fc[i]).astype(dt)
        if ln:
            y = layer_norm(y, wb_fc[i])
        x = y + x
        # --- positional embedding (zeros for blocks without one) ---
        x = (x.reshape(b_, f, c) + pe[i][None]).reshape(rows, c)
        # --- frequency MHSA (masked-lane head structure, shared helper) ---
        attn = freq_mhsa_lanes(x, w_q[i], w_k[i], w_v[i],
                               b_q[i], b_k[i], b_v[i],
                               head_mask, gmask, kmask,
                               b_, f, c, num_heads)
        # --- attention linear (BN folded / LN inline) + residual ---
        y = (_mm(attn, w_afc[i]) + b_afc[i]).astype(dt)
        if ln:
            y = layer_norm(y, wb_afc[i])
        x = y + x
    return x


_LN_KEYS = ("wb_fc", "wb_afc", "fmask", "ln_eps")


def _stack_kernel(num_blocks: int, num_heads: int, batch: int, freq: int,
                  channels: int, ln: bool, *refs):
    (x_ref, h_ref, *plan_refs, x_out, h_out) = refs
    keys = _PLAN_KEYS + (_LN_KEYS if ln else ())
    plan_vals = dict(zip(keys, plan_refs))
    x = x_ref[:].reshape(batch * freq, channels)
    x = stack_math(x, lambda i: h_ref[i], lambda i, h: h_out.__setitem__(i, h),
                   plan_vals, num_blocks, num_heads, batch, freq, channels,
                   ln=ln)
    x_out[:] = x.reshape(batch, freq, channels)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

# tuning knobs, resolved once at import (see _auto_batch_tile docstring)
_TILE_ROWS_LIMIT = int(os.environ.get("FE_STACK_TILE_ROWS", 4096))
_TILE_BYTES_LIMIT = int(os.environ.get("FE_STACK_TILE_BYTES", 24 << 20))


def _auto_batch_tile(b: int, f: int, num_heads: int) -> int:
    """Largest divisor of b whose per-program working set fits comfortably
    in VMEM. Two limits (env-overridable for tuning):
      * rows = tile*f <= FE_STACK_TILE_ROWS (default 4096): the activation
        row count Mosaic handles well — the 48 kHz shapes hit a
        pathological compile above ~8192 rows, and wall-time flattens out
        well below that;
      * f32 softmax intermediates (logits + exp, each [tile, f, H*f])
        <= FE_STACK_TILE_BYTES (default 24 MiB) — the dominant VMEM tenant
        for the wide (M/L) recipes.
    Both env knobs are read at IMPORT time: this function runs at trace
    time under jax.jit, so a post-compile env change with the same shapes
    would otherwise be silently ignored by the jit cache.
    """
    limit_rows = _TILE_ROWS_LIMIT
    limit_bytes = _TILE_BYTES_LIMIT
    best = 1
    for tile in range(1, b + 1):
        if b % tile:
            continue
        if tile * f > limit_rows:
            break
        if 2 * 4 * tile * f * num_heads * f > limit_bytes:
            break
        best = tile
    return best


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "interpret", "batch_tile"))
def rnnformer_stack_step(
    plan: Params, x: Array, h: Array, num_heads: int,
    interpret: tp.Optional[bool] = None,
    batch_tile: tp.Optional[int] = None,
) -> tp.Tuple[Array, Array]:
    """One fused streaming frame through every block.

    x: [B, F, C] frame activations (rf_pre output), h: [NB, B*F, C] stacked
    GRU carries -> (x_out [B, F, C], h_new [NB, B*F, C]). Exact same math as
    looping Model._block_apply over the folded blocks (tested).
    interpret=None auto-selects the Pallas interpreter off-TPU (CI/CPU).

    Streams are tiled over a Pallas grid in contiguous batch blocks (h rows
    are b-major, so a batch tile is a contiguous row range): large stream
    counts and the wide S/M/L / 48 kHz shapes stay within VMEM instead of
    holding the whole problem resident. batch_tile=None auto-sizes; pass an
    explicit divisor of B to override.
    """
    if interpret is None:  # axon == tunneled TPU; only pure CPU interprets
        interpret = jax.default_backend() == "cpu"
    b, f, c = x.shape
    nb = h.shape[0]
    fp = pad_freq(f)
    if fp != f:
        # pad the frequency axis to a sublane multiple; padded keys are
        # softmax-masked in the kernel (plan kmask), padded query/GRU rows
        # are junk-but-isolated and sliced off below
        x = jnp.pad(x, ((0, 0), (0, fp - f), (0, 0)))
        h = jnp.pad(h.reshape(nb, b, f, c),
                    ((0, 0), (0, 0), (0, fp - f), (0, 0))
                    ).reshape(nb, b * fp, c)
    tile = _auto_batch_tile(b, fp, num_heads) if batch_tile is None \
        else batch_tile
    if b % tile:
        # grid = b // tile programs: a non-dividing tile would leave the
        # tail batch rows unwritten (and an assert is stripped under -O)
        raise ValueError(f"batch_tile {tile} does not divide batch {b}")
    ln = "wb_fc" in plan  # LN-ablation block form (plan_stack ln_eps=...)
    keys = _PLAN_KEYS + (_LN_KEYS if ln else ())
    kernel = functools.partial(_stack_kernel, nb, num_heads, tile, fp, c, ln)

    def full(k: str):
        # no block_shape: the whole array sits in VMEM for every grid step
        # (no per-step copy pipelining — a blocked constant-index spec for
        # all 23 weight inputs sends Mosaic's pipeliner into a pathological
        # multi-minute compile). The ln_eps scalar goes to SMEM.
        if k == "ln_eps":
            return pl.BlockSpec(memory_space=pltpu.SMEM)
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    x_out, h_out = pl.pallas_call(
        kernel,
        grid=(b // tile,),
        out_shape=(jax.ShapeDtypeStruct((b, fp, c), x.dtype),
                   jax.ShapeDtypeStruct(h.shape, h.dtype)),
        in_specs=[
            pl.BlockSpec((tile, fp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tile * fp, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            *[full(k) for k in keys],
        ],
        out_specs=(
            pl.BlockSpec((tile, fp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tile * fp, c), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, h, *[plan[k] for k in keys])
    if fp != f:
        x_out = x_out[:, :f]
        h_out = h_out.reshape(nb, b, fp, c)[:, :, :f].reshape(nb, b * f, c)
    return x_out, h_out
