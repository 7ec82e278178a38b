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

def plan_stack(blocks: tp.Sequence[Params], freq: int, num_heads: int,
               dtype=None) -> Params:
    """Pack folded rf_blocks params (Model.fold() output; weight-norm already
    stripped, post-norms merged into the fcs, no pre-norms) into stacked,
    pre-transposed arrays. Leading dim = block index. dtype=None inherits
    the blocks' own dtype (a mismatched f32 plan would silently promote the
    kernel's bf16 activations)."""
    nb = len(blocks)
    w_hh0 = blocks[0]["rnn"]["weight_hh"]
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
        return (cat(lambda b: b[name]["weight"].T),
                cat(lambda b: b[name]["bias"][None]))

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

    pe = jnp.zeros((nb, freq, c), dtype)
    for i, b in enumerate(blocks):
        if "pe" in b and b["pe"] is not None:
            pe = pe.at[i].set(jnp.asarray(b["pe"]["weight"], dtype))

    head_mask = (np.arange(c)[None, :] // d
                 == np.arange(num_heads)[:, None]).astype(np.float32)
    # per-head lane-group mask over the [H*F] folded score lanes (f32: it
    # multiplies f32 softmax intermediates)
    gmask = (np.arange(num_heads * freq)[None, :] // freq
             == np.arange(num_heads)[:, None]).astype(np.float32)

    return dict(gates, w_fc=w_fc, b_fc=b_fc, w_afc=w_afc, b_afc=b_afc,
                w_q=w_q, w_k=w_k, w_v=w_v, b_q=b_q, b_k=b_k, b_v=b_v,
                pe=pe, head_mask=jnp.asarray(head_mask, dtype),
                gmask=jnp.asarray(gmask, jnp.float32))


_PLAN_KEYS = ("w_xr", "w_hr", "b_r", "w_xz", "w_hz", "b_z",
              "w_xn", "w_hn", "b_xn", "b_hn",
              "w_fc", "b_fc", "w_afc", "b_afc",
              "w_q", "w_k", "w_v", "b_q", "b_k", "b_v", "pe", "head_mask",
              "gmask")


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _mm(a: Array, w: Array) -> Array:
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _bdot(a: Array, b: Array, contract: int, b_contract: int) -> Array:
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((contract,), (b_contract,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _stack_kernel(num_blocks: int, num_heads: int, batch: int, freq: int,
                  channels: int, *refs):
    (x_ref, h_ref,
     w_xr, w_hr, b_r, w_xz, w_hz, b_z, w_xn, w_hn, b_xn, b_hn,
     w_fc, b_fc, w_afc, b_afc, w_q, w_k, w_v, b_q, b_k, b_v, pe, head_mask,
     gmask_ref, x_out, h_out) = refs
    b_, f, c = batch, freq, channels
    rows = b_ * f
    dt = x_ref.dtype
    scale = 1.0 / np.sqrt(c // num_heads)

    x = x_ref[:].reshape(rows, c)
    for i in range(num_blocks):
        # --- time GRU (one step; torch gate order r,z,n) ---
        # VPU math stays f32 (Mosaic rejects bf16 transcendentals; f32 is
        # also what the XLA bf16 path effectively computes for these)
        h = h_ref[i]
        r = jax.nn.sigmoid(_mm(x, w_xr[i]) + _mm(h, w_hr[i])
                           + b_r[i].astype(jnp.float32))
        z = jax.nn.sigmoid(_mm(x, w_xz[i]) + _mm(h, w_hz[i])
                           + b_z[i].astype(jnp.float32))
        n = jnp.tanh(_mm(x, w_xn[i]) + b_xn[i].astype(jnp.float32)
                     + r * (_mm(h, w_hn[i]) + b_hn[i].astype(jnp.float32)))
        h_new = ((1.0 - z) * n + z * h.astype(jnp.float32)).astype(dt)
        h_out[i] = h_new
        # --- post-GRU linear (BN folded) + residual ---
        x = (_mm(h_new, w_fc[i]) + b_fc[i]).astype(dt) + x
        # --- positional embedding (zeros for blocks without one) ---
        x = (x.reshape(b_, f, c) + pe[i][None]).reshape(rows, c)
        # --- frequency MHSA (masked-lane head structure) ---
        q = (_mm(x, w_q[i]) + b_q[i]).astype(dt).reshape(b_, f, c)
        k = (_mm(x, w_k[i]) + b_k[i]).astype(dt).reshape(b_, f, c)
        v = (_mm(x, w_v[i]) + b_v[i]).astype(dt).reshape(b_, f, c)
        m = head_mask[:]  # [H, C]
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
        logits = _bdot(q, kblk, 2, 2) * scale            # [B, F, H*F] f32
        # grouped softmax over each head's F-lane block, via masked
        # reductions (Mosaic cannot lane-split [.., H*F] -> [.., H, F])
        # f32 compare: Mosaic has no bf16 cmpf, and a whole-plan bf16 cast
        # (bench/serving) would otherwise turn this mask bf16
        gm = gmask_ref[:].astype(jnp.float32)            # [H, H*F]
        mx = None
        for g in range(num_heads):
            mg = jnp.max(jnp.where(gm[g][None, None, :] > 0, logits, -1e30),
                         axis=-1, keepdims=True)         # [B, F, 1]
            part = mg * gm[g][None, None, :]
            mx = part if mx is None else mx + part
        p = jnp.exp(logits - mx)
        den = None
        for g in range(num_heads):
            dg = jnp.sum(p * gm[g][None, None, :], axis=-1, keepdims=True)
            part = dg * gm[g][None, None, :]
            den = part if den is None else den + part
        probs = (p / den).astype(dt)
        attn = _bdot(probs, vblk, 2, 1).astype(dt)       # [B, F, C]
        # --- attention linear (BN folded) + residual ---
        x = (_mm(attn.reshape(rows, c), w_afc[i]) + b_afc[i]).astype(dt) + x
    x_out[:] = x.reshape(b_, f, c)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def rnnformer_stack_step(
    plan: Params, x: Array, h: Array, num_heads: int,
    interpret: tp.Optional[bool] = None,
) -> tp.Tuple[Array, Array]:
    """One fused streaming frame through every block.

    x: [B, F, C] frame activations (rf_pre output), h: [NB, B*F, C] stacked
    GRU carries -> (x_out [B, F, C], h_new [NB, B*F, C]). Exact same math as
    looping Model._block_apply over the folded blocks (tested).
    interpret=None auto-selects the Pallas interpreter off-TPU (CI/CPU).
    """
    if interpret is None:  # axon == tunneled TPU; only pure CPU interprets
        interpret = jax.default_backend() == "cpu"
    b, f, c = x.shape
    nb = h.shape[0]
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_stack_kernel, nb, num_heads, b, f, c)
    x_out, h_out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b, f, c), x.dtype),
                   jax.ShapeDtypeStruct(h.shape, h.dtype)),
        in_specs=[vmem() for _ in range(2 + len(_PLAN_KEYS))],
        out_specs=(vmem(), vmem()),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, h, *[plan[k] for k in _PLAN_KEYS])
    return x_out, h_out
