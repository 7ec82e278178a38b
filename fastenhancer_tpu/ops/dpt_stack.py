"""Fused Pallas kernel: the dptransformer block stack for ONE streaming frame.

The dpt ablation replaces the time-GRU with causal local attention over a
fixed lookbehind window (reference: models/fastenhancer/dptransformer/
model.py:174-236): per frame each block projects q/k/v, scores the query
against the last L cached keys + itself, softmaxes with a learned relative
position bias pe [NH, L+1], mixes the cached values, then runs the default
block's frequency MHSA. The XLA streaming path is the slowest family member
per parameter (1.14e-4 RTF at 256 streams vs 3.6e-5 for same-size FE_B):
every frame it CONCATENATES the rolling K/V cache with the new frame and
re-slices it — a full HBM rewrite of ~80 MB of cache per frame at 256
streams — and lowers to ~20 small ops per block whose dispatch latency
stacks up, the same regime the RNNFormer/BSRNN fused kernels beat.

This kernel runs the whole stack as ONE Pallas program per frame and turns
the cache shift into a rotating SLOT POINTER: the cache is read-only inside
the kernel; the kernel emits the frame's k/v and XLA writes exactly one
slot per block with `lax.dynamic_update_slice` on the donated scan carry
(measured 5 us/frame at 256 streams) — per-frame cache traffic drops from
read+rewrite to read+one-slot-write. Slot ages are encoded OUTSIDE the
kernel as a per-frame additive bias-lane vector (pe gathered by age), so
the kernel itself is pointer-free. Zero-initialised slots reproduce the
XLA path's semantics exactly: an unwritten slot contributes exp(bias)*0 to
the value mix and its exp(bias) mass to the denominator — the same
multiset of logits the concat-of-zeros path produces, so outputs match
from frame 0 (tested), and a mid-serving slot reset is correct at ANY
pointer value.

Layout: the time-attention state is CHANNEL-MAJOR. Per-row attention
(each row = one (stream, freq-bin) attending to its own cache) cannot be a
plain matmul, and the row-major forms all lose to the memory system
(measured at 256 streams on v5e: XLA concat path 467 us/frame; per-slot
thin matmuls under fori_loop 675 us; statically unrolled 442 us — each
[rows, C=36] tile wastes 72% of its VMEM lanes and every one of the 192
per-slot matmuls pads its contraction to 128). Storing the cache as
[NB, L, C, rows] instead makes rows the lane dimension:

  * The q*K elementwise product for ALL slots is ONE broadcast multiply
    [L, C, rows] and ONE reshape to [L*C, rows] (contiguous, no relayout).
  * All slots' per-head scores come from ONE [NH*S, L*C] x [L*C, rows]
    matmul with a fixed 0/1 selection matrix (msel: head-mask entries at
    (h*S+s, s*C+c)) — MXU-dense, no lane padding on rows.
  * Softmax-over-slots is a reshape to [NH, S, rows] (sublane-major split,
    free) and keepdims reductions over the slot axis.
  * Value mixing transposes the same msel (probs -> per-(slot,channel)
    weights [L*C, rows]), multiplies the V buffer and sums over the slot
    axis.
  * VMEM holds C on the sublane axis (36 -> 48 pad, 1.3x) instead of the
    lane axis (36 -> 128 pad, 3.6x) — the cache block that OOM'd VMEM at
    batch-tile 128 row-major fits comfortably.

Activations enter/leave each block row-major ([rows, C], shared with the
freq-MHSA which reuses freq_mhsa_lanes from ops/rnnformer_stack.py
verbatim); the kernel transposes x once into C-major per block and the
attention result once back.

Only the *folded* inference form is implemented (fold(): post-BNs merged
into the fc weights, optional pre-norms into qkv — reference deploy path
models/fastenhancer/dptransformer/model.py + default BN-fold math);
training keeps the composable XLA path.
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

from .rnnformer_stack import freq_mhsa_lanes, pad_freq, _mm

Array = jax.Array
Params = tp.Dict[str, tp.Any]

_PLAN_KEYS = ("w_tq", "w_tk", "w_tv", "b_tq", "b_tk", "b_tv",
              "w_tfc", "b_tfc", "msel_cache", "msel_cur",
              "w_fq", "w_fk", "w_fv", "b_fq", "b_fk", "b_fv",
              "w_ffc", "b_ffc", "pe", "head_mask", "gmask_f", "kmask_f")


# ---------------------------------------------------------------------------
# Plan: folded block params -> stacked kernel-ready arrays
# ---------------------------------------------------------------------------

def plan_dpt_stack(blocks: tp.Sequence[Params], time_pe: Array, freq: int,
                   num_heads: int, lookbehind: int, dtype=None) -> Params:
    """Pack folded dpt rf_blocks params (Model.fold() output) + the
    model-level relative time bias into stacked, kernel-ready arrays.
    Leading dim = block index. dtype=None inherits the blocks' own dtype.
    Time-attention projections are stored UNtransposed ([C_out, C_in]: the
    kernel computes q in channel-major as w @ x_cm); the freq-attention
    side keeps the row-major transposed layout freq_mhsa_lanes expects.
    The returned dict also carries "time_pe" [NH, L+1] for the per-frame
    bias-lane computation in the model wrapper (NOT a kernel operand)."""
    nb = len(blocks)
    w0 = blocks[0]["time_attn"]["qkv"]["weight"]
    if isinstance(w0, dict):  # {"g","v"} weight-norm tree
        raise ValueError("plan_dpt_stack expects fold() output "
                         "(weight norm still present)")
    if dtype is None:
        dtype = w0.dtype
    c = int(np.asarray(w0).shape[1])
    d = c // num_heads
    s_lanes = lookbehind + 1

    def cat(fn):
        return jnp.stack([jnp.asarray(fn(b), dtype) for b in blocks])

    # reference qkv row layout is per-head [q_h | k_h | v_h]; gather rows
    # into head-major q/k/v order so output channel h*d+t == head h, dim t
    lane = np.arange(c)
    q_rows = (lane // d) * 3 * d + lane % d
    zeros3 = np.zeros((3 * c,), np.float32)

    def attn_plan(which, transposed):
        def w(off):
            if transposed:
                return cat(
                    lambda b: b[f"{which}_attn"]["qkv"]["weight"][q_rows + off].T)
            return cat(
                lambda b: b[f"{which}_attn"]["qkv"]["weight"][q_rows + off])

        b_qkv = cat(
            lambda b: np.asarray(b[f"{which}_attn"]["qkv"].get("bias", zeros3)))
        return (w(0), w(d), w(2 * d), b_qkv[:, None, q_rows],
                b_qkv[:, None, q_rows + d], b_qkv[:, None, q_rows + 2 * d])

    w_tq, w_tk, w_tv, b_tq, b_tk, b_tv = attn_plan("time", transposed=False)
    w_fq, w_fk, w_fv, b_fq, b_fk, b_fv = attn_plan("freq", transposed=True)

    def fc(name):
        zeros = np.zeros((c,), np.float32)
        return (cat(lambda b: b[name]["weight"].T),
                cat(lambda b: np.asarray(b[name].get("bias", zeros))[None]))

    w_tfc, b_tfc = fc("time_fc")
    w_ffc, b_ffc = fc("freq_fc")

    fp = pad_freq(freq)
    pe = jnp.zeros((nb, fp, c), dtype)
    for i, b in enumerate(blocks):
        if "pe" in b and b["pe"] is not None:
            pe = pe.at[i, :freq].set(jnp.asarray(b["pe"]["weight"], dtype))

    head_mask = (np.arange(c)[None, :] // d
                 == np.arange(num_heads)[:, None]).astype(np.float32)
    # slot-selection matrix (see module docstring): one matmul folds every
    # cache slot's q*K product into per-head score sublanes, its transpose
    # expands probs back to per-(slot, channel) value weights
    msel = np.zeros((num_heads * s_lanes, s_lanes * c), np.float32)
    for s in range(s_lanes):
        msel[(lane // d) * s_lanes + s, s * c + lane] = 1.0
    gmask_f = (np.arange(num_heads * fp)[None, :] // fp
               == np.arange(num_heads)[:, None]).astype(np.float32)
    kmask_f = np.zeros((1, num_heads * fp), np.float32)
    kmask_f[0, (np.arange(num_heads * fp) % fp) >= freq] = -1e30

    return {
        "w_tq": w_tq, "w_tk": w_tk, "w_tv": w_tv,
        "b_tq": b_tq, "b_tk": b_tk, "b_tv": b_tv,
        "w_tfc": w_tfc, "b_tfc": b_tfc,
        "msel_cache": jnp.asarray(msel[:, :lookbehind * c], dtype),
        "msel_cur": jnp.asarray(msel[:, lookbehind * c:], dtype),
        "w_fq": w_fq, "w_fk": w_fk, "w_fv": w_fv,
        "b_fq": b_fq, "b_fk": b_fk, "b_fv": b_fv,
        "w_ffc": w_ffc, "b_ffc": b_ffc,
        "pe": pe,
        "head_mask": jnp.asarray(head_mask, dtype),
        "gmask_f": jnp.asarray(gmask_f, jnp.float32),
        "kmask_f": jnp.asarray(kmask_f, jnp.float32),
        "time_pe": jnp.asarray(time_pe, jnp.float32),
    }


def bias_lanes_for_ptr(time_pe: Array, ptr: Array, lookbehind: int) -> Array:
    """Per-frame additive bias over the [NH*(L+1)] folded score lanes.

    Slot s (< L) was last written at the frame where the rotating pointer
    equalled s, i.e. age ((ptr-1-s) mod L) + 1 frames ago -> bias
    pe[:, L - age]; lane block s = L is the current frame -> pe[:, L].
    Unwritten (zero) slots get a finite bias too — exactly the XLA concat
    path's zero-key semantics (their value contribution is zero and their
    softmax mass matches, see module docstring)."""
    lb = lookbehind
    s_idx = jnp.arange(lb)
    age = ((ptr - 1 - s_idx) % lb) + 1                   # 1..L
    bias_cache = jnp.take(time_pe, lb - age, axis=1)     # [NH, L]
    bias = jnp.concatenate([bias_cache, time_pe[:, lb:lb + 1]], axis=1)
    return bias.reshape(1, -1).astype(jnp.float32)       # [1, NH*(L+1)]


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _cm_dot(m: Array, x: Array) -> Array:
    """[O, K] @ [K, rows] -> [O, rows], f32 accumulation."""
    return jax.lax.dot_general(
        m, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dpt_stack_kernel(num_blocks: int, num_heads: int, lookbehind: int,
                      batch: int, freq: int, channels: int, *refs):
    (x_ref, kc_ref, vc_ref, bias_ref, *plan_refs, x_out, k_out, v_out) = refs
    plan = dict(zip(_PLAN_KEYS, plan_refs))
    b_, f, c, lb, nh = batch, freq, channels, lookbehind, num_heads
    s_lanes = lb + 1
    rows = b_ * f
    x = x_ref[:].reshape(rows, c)
    dt = x.dtype
    scale = 1.0 / np.sqrt(c // nh)
    # [1, NH*S] -> [NH*S, 1] so it broadcasts over the lane (row) axis
    bias_cm = jnp.transpose(bias_ref[:].astype(jnp.float32))
    head_mask = plan["head_mask"][:]
    gmask_f = plan["gmask_f"][:]
    kmask_f = plan["kmask_f"][:]
    msel_cache = plan["msel_cache"][:]
    msel_cur = plan["msel_cur"][:]

    for i in range(num_blocks):
        # --- causal local time attention (channel-major) ----------------
        x_cm = jnp.transpose(x)                           # [C, rows]
        q = (_cm_dot(plan["w_tq"][i], x_cm)
             + jnp.transpose(plan["b_tq"][i]).astype(jnp.float32)).astype(dt)
        k_cur = (_cm_dot(plan["w_tk"][i], x_cm)
                 + jnp.transpose(plan["b_tk"][i]).astype(jnp.float32)
                 ).astype(dt)
        v_cur = (_cm_dot(plan["w_tv"][i], x_cm)
                 + jnp.transpose(plan["b_tv"][i]).astype(jnp.float32)
                 ).astype(dt)
        k_out[i] = k_cur
        v_out[i] = v_cur

        # scores for ALL cache slots in two dense matmuls (module docstring)
        e_all = (kc_ref[i] * q[None]).reshape(lb * c, rows)
        logits = (_cm_dot(msel_cache, e_all)
                  + _cm_dot(msel_cur, k_cur * q))          # [NH*S, rows] f32
        logits = logits * scale + bias_cm
        # softmax over the slot axis: sublane-major split is free
        l3 = logits.reshape(nh, s_lanes, rows)
        mx = jnp.max(l3, axis=1, keepdims=True)            # [NH, 1, rows]
        p = jnp.exp(l3 - mx)
        den = jnp.sum(p, axis=1, keepdims=True)
        probs = ((p / jnp.maximum(den, 1e-30))
                 .reshape(nh * s_lanes, rows).astype(dt))
        # value mix: msel transposed expands probs to per-(slot, channel)
        # weights; multiply V and reduce over the slot axis
        pexp = jax.lax.dot_general(
            msel_cache, probs, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [L*C, rows]
        mix = (pexp * vc_ref[i].reshape(lb * c, rows).astype(jnp.float32))
        attn_cm = jnp.sum(mix.reshape(lb, c, rows), axis=0)
        pexp_cur = jax.lax.dot_general(
            msel_cur, probs, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [C, rows]
        attn_cm = attn_cm + pexp_cur * v_cur.astype(jnp.float32)
        attn = jnp.transpose(attn_cm.astype(dt))           # [rows, C]
        # --- time fc (post-BN folded) + residual ------------------------
        x = (_mm(attn, plan["w_tfc"][i])
             + plan["b_tfc"][i].astype(jnp.float32)).astype(dt) + x
        # --- positional embedding (zeros for blocks without one) --------
        x = (x.reshape(b_, f, c) + plan["pe"][i][None]).reshape(rows, c)
        # --- frequency MHSA (shared masked-lane helper) + fc + residual -
        fattn = freq_mhsa_lanes(
            x, plan["w_fq"][i], plan["w_fk"][i], plan["w_fv"][i],
            plan["b_fq"][i], plan["b_fk"][i], plan["b_fv"][i],
            head_mask, gmask_f, kmask_f, b_, f, c, num_heads)
        x = (_mm(fattn, plan["w_ffc"][i])
             + plan["b_ffc"][i].astype(jnp.float32)).astype(dt) + x

    x_out[:] = x.reshape(b_, f, c)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

_TILE_BYTES_LIMIT = int(os.environ.get("DPT_STACK_TILE_BYTES", 26 << 20))


def _sublane(itemsize: int) -> int:
    return 8 if itemsize >= 4 else 16


def _auto_batch_tile(b: int, f: int, c: int, nb: int, lb: int, nh: int,
                     itemsize: int) -> int:
    """Largest divisor of b whose per-program working set fits a VMEM byte
    budget (env-overridable: DPT_STACK_TILE_BYTES, read at import time —
    this runs at trace time, a post-compile env change would be silently
    ignored by the jit cache). The K/V cache is the dominant tenant; its
    blocked window is double-buffered by Mosaic's pipeliner and pads C up
    to the sublane tile, both accounted here against a single-buffer
    budget (hence the conservative default)."""
    c_pad = -(-c // _sublane(itemsize)) * _sublane(itemsize)
    best = 0
    for tile in range(1, b + 1):
        if b % tile:
            continue
        rows = tile * f
        cache = 2 * nb * lb * c_pad * rows * itemsize   # kc + vc block
        kv_out = 2 * nb * c_pad * rows * itemsize
        logits = 4 * nh * (lb + 1) * rows * 4           # f32 intermediates
        pexp = (lb + 1) * c_pad * rows * 4              # f32 value weights
        if cache + kv_out + logits + pexp > _TILE_BYTES_LIMIT:
            break
        best = tile
    if not best:
        raise ValueError(
            f"batch {b} has no divisor that fits the fused dpt-stack kernel "
            f"(DPT_STACK_TILE_BYTES={_TILE_BYTES_LIMIT}); use the XLA "
            "streaming path for this shape")
    return best


@functools.partial(
    jax.jit, static_argnames=("num_heads", "lookbehind", "interpret",
                              "batch_tile"))
def dpt_stack_step(
    plan: Params, x: Array, kc: Array, vc: Array, bias_lanes: Array,
    num_heads: int, lookbehind: int,
    interpret: tp.Optional[bool] = None,
    batch_tile: tp.Optional[int] = None,
) -> tp.Tuple[Array, Array, Array]:
    """One fused streaming frame through every dpt block.

    x: [B, F, C] frame activations (rf_pre output, F unpadded);
    kc/vc: [NB, L, C, B*Fp] rotating K/V caches (channel-major, rows =
    b-major stream x freq-bin, Fp = pad_freq(F)); bias_lanes:
    [1, NH*(L+1)] per-frame pe bias (bias_lanes_for_ptr). Returns
    (x_out [B, F, C], k_new, v_new [NB, C, B*Fp]) — the caller writes k/v
    into slot ptr with `lax.dynamic_update_slice` and advances ptr mod L.
    Exact same math as the XLA streaming path on folded variables (tested).
    interpret=None auto-selects the Pallas interpreter off-TPU (CI/CPU)."""
    if interpret is None:  # axon == tunneled TPU; only pure CPU interprets
        interpret = jax.default_backend() == "cpu"
    b, f, c = x.shape
    nb, lb = kc.shape[0], kc.shape[1]
    if lb != lookbehind:
        raise ValueError(f"cache has {lb} slots, lookbehind={lookbehind}")
    fp = pad_freq(f)
    if fp != f:
        # padded-frequency rows are junk-but-isolated (per-row time
        # attention; freq attention masks padded keys) and sliced off below;
        # their cache rows persist in the carry but never mix into real rows
        x = jnp.pad(x, ((0, 0), (0, fp - f), (0, 0)))
    tile = (_auto_batch_tile(b, fp, c, nb, lb, num_heads, x.dtype.itemsize)
            if batch_tile is None else batch_tile)
    if b % tile:
        raise ValueError(f"batch_tile {tile} does not divide batch {b}")
    kernel = functools.partial(_dpt_stack_kernel, nb, num_heads, lb, tile,
                               fp, c)

    def full(a: Array):
        del a
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    x_out, k_out, v_out = pl.pallas_call(
        kernel,
        grid=(b // tile,),
        out_shape=(jax.ShapeDtypeStruct((b, fp, c), x.dtype),
                   jax.ShapeDtypeStruct((nb, c, b * fp), x.dtype),
                   jax.ShapeDtypeStruct((nb, c, b * fp), x.dtype)),
        in_specs=[
            pl.BlockSpec((tile, fp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, lb, c, tile * fp), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, lb, c, tile * fp), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            full(bias_lanes),
            *[full(plan[k]) for k in _PLAN_KEYS],
        ],
        out_specs=(
            pl.BlockSpec((tile, fp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, c, tile * fp), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, c, tile * fp), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x, kc, vc, bias_lanes, *[plan[k] for k in _PLAN_KEYS])
    if fp != f:
        x_out = x_out[:, :f]
    return x_out, k_out, v_out
