"""Whole-frame fused Pallas kernel — a KEPT NEGATIVE RESULT.

Hypothesis: after ops/rnnformer_stack.py fused the K-block stack (94 of
~170 us/frame at 256 streams), the ~60 us of XLA ops around it (encoder
convs, rf_pre/rf_post resampling, skip-concat decoder, final ConvT) were
dispatch-bound and would shrink inside ONE Pallas program running the
ENTIRE model_forward per frame.

Measured on v5e (FastEnhancer_B, 256 streams, bf16, slope-timed): the
whole-frame kernel is 1.8x SLOWER than fused-stack + XLA around it —
307 vs 170 us/frame end-to-end. Stage ablation inside the kernel:
  * the enc/dec conv + ConvT stages cost ~190 us in Mosaic vs ~60 us
    under XLA: each shifted-tap matmul at [B*F rows, <=48 lanes] pays
    lane padding + sequential issue that XLA's conv lowering avoids;
  * the freq-resampling linears (sublane-contraction via transpose) are
    FREE (within noise) — transposes were not the problem;
  * the stack itself runs ~20 us slower inside the bigger program
    (115 vs 94 us standalone) — VMEM pressure/scheduling.
So XLA already runs these conv shapes near its floor, and the fusion
boundary (stack-only) shipped in round 2 is the right one. The kernel is
kept because it is exact (parity tests below) and documents the envelope
for anyone tempted to retry; same policy as ops/gru_scan.py.

Applies to the folded inference form of `fastenhancer.default` recipes
(reference deploy path, models/.../model.py:532-608). Exact same math as
`Model.streaming_step` on folded variables (tested in
tests/test_ops_pallas.py); `Model.streaming_step_fused_frame` is the
entry. docs/performance.md records the numbers.

Conv mapping (all channels-last, freq axis = sublanes, channels = lanes):
  * freq convs (k taps, stride 1) = k shifted matmuls on zero-padded
    activations — no im2col materialization;
  * the StridedConv encoder PreNet arrives pre-reshaped ([B, F/s+1, s*Cin],
    the reference's reshape trick) so it is a 2-tap conv;
  * the rf_pre/rf_post frequency resampling linears contract the sublane
    (freq) axis: transpose to [.., C, F], one matmul, transpose back;
  * skip concats become split-weight sums (x @ W_x + skip @ W_skip) — no
    concatenated buffers;
  * the stride-s ConvTranspose1d is s phase matmuls (2 taps each for
    k = 2s) emitted as [B, F, s*2] and de-interleaved by a free reshape
    outside the kernel.
"""
from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rnnformer_stack import (_PLAN_KEYS, _auto_batch_tile, _mm, pad_freq,
                              plan_stack, stack_math)

Array = jax.Array
Params = tp.Dict[str, tp.Any]


# ---------------------------------------------------------------------------
# Plan
# ---------------------------------------------------------------------------

def _conv_taps(conv: Params, dtype) -> tp.Tuple[tp.List[Array], Array]:
    """torch-layout conv weight [Cout, Cin, K] -> K matrices [Cin, Cout]."""
    w = np.asarray(conv["weight"])
    taps = [jnp.asarray(w[:, :, k].T, dtype) for k in range(w.shape[2])]
    return taps, jnp.asarray(np.asarray(conv["bias"])[None], dtype)


def plan_frame(model, variables: Params, dtype=None) -> Params:
    """Pack a folded fastenhancer.default model for the whole-frame kernel.

    Raises ValueError when the recipe is outside the kernel's envelope
    (callers fall back to the stack-only kernel / XLA body).
    """
    for bs in jax.tree.leaves(variables["stats"]):
        if bs:
            raise ValueError("plan_frame expects fold() output")
    p = variables["params"]
    cfg = model
    if cfg.kernel_size[0] != 2 * cfg.stride:
        raise ValueError("fused frame supports kernel_size[0] == 2*stride")
    if cfg.activation != "SiLU":
        raise ValueError("fused frame supports SiLU activation only")
    if cfg.mask_name not in (None, "sigmoid", "tanh"):
        raise ValueError(f"unsupported mask activation {cfg.mask_name!r}")
    if cfg.rf.post_act:
        raise ValueError("fused frame: post_act recipes unsupported")
    f_enc = cfg.freq  # encoder-domain freq (F0/stride)
    if f_enc % 8:
        raise ValueError(f"encoder freq {f_enc} not 8-aligned")

    if dtype is None:
        dtype = np.asarray(p["rf_blocks"][0]["rnn"]["weight_hh"]).dtype

    plan: Params = {"stack": plan_stack(p["rf_blocks"], cfg.block_freq,
                                        cfg.rf.num_heads, dtype=dtype)}
    enc_pre_taps, plan["b_enc_pre"] = _conv_taps(p["enc_pre"]["conv"], dtype)
    plan["w_enc_pre"] = jnp.stack(enc_pre_taps)          # [2, s*2, C]
    for i, ep in enumerate(p["encoder"]):
        taps, b = _conv_taps(ep["conv"], dtype)
        plan[f"w_enc{i}"] = jnp.stack(taps)              # [k, C, C]
        plan[f"b_enc{i}"] = b

    # rf_pre / rf_post: F-resample linear (weight [F_out, F_in]) + 1x1 conv
    for name in ("rf_pre", "rf_post"):
        plan[f"w_{name}_lin"] = jnp.asarray(
            np.asarray(p[name]["lin"]["weight"]).T, dtype)  # [F_in, F_out]
        taps, b = _conv_taps(p[name]["conv"], dtype)
        plan[f"w_{name}"] = taps[0]
        plan[f"b_{name}"] = b

    for i, dp in enumerate(p["decoder"]):
        w1 = np.asarray(dp["conv1"]["weight"])           # [C, 2C, 1]
        c = w1.shape[0]
        plan[f"w_dec{i}_x"] = jnp.asarray(w1[:, :c, 0].T, dtype)
        plan[f"w_dec{i}_s"] = jnp.asarray(w1[:, c:, 0].T, dtype)
        plan[f"b_dec{i}_1"] = jnp.asarray(
            np.asarray(dp["conv1"]["bias"])[None], dtype)
        taps, b = _conv_taps(dp["conv2"], dtype)
        plan[f"w_dec{i}_2"] = jnp.stack(taps)
        plan[f"b_dec{i}_2"] = b

    wp = np.asarray(p["dec_post"]["conv"]["weight"])     # [C, 2C, 1]
    c = wp.shape[0]
    plan["w_post_x"] = jnp.asarray(wp[:, :c, 0].T, dtype)
    plan["w_post_s"] = jnp.asarray(wp[:, c:, 0].T, dtype)
    plan["b_post"] = jnp.asarray(
        np.asarray(p["dec_post"]["conv"]["bias"])[None], dtype)

    # ConvTranspose1d(stride=s, k=2s, pad=s/2): out[s*m + r] =
    #   x[m] @ W[:, :, r + s/2]  +  x[m-1] @ W[:, :, r + 3s/2]   (r <  s/2)
    #                            |  x[m+1] @ W[:, :, r -   s/2]   (r >= s/2)
    # (torch convT: out[t] = sum_j x[j] W[:, :, t - s*j + pad], pad = s/2;
    #  validated against nn/layers.py conv_transpose1d_cl in the tests)
    wt = np.asarray(p["dec_post"]["convt"]["weight"])    # [Cin, 2, 2s]
    s = cfg.stride
    half = s // 2
    a_taps, b_taps = [], []
    for r in range(s):
        a_taps.append(wt[:, :, r + half])
        b_taps.append(wt[:, :, r + half + s] if r < half
                      else wt[:, :, r + half - s])
    plan["w_convt_a"] = jnp.asarray(np.stack(a_taps), dtype)  # [s, C, 2]
    plan["w_convt_b"] = jnp.asarray(np.stack(b_taps), dtype)
    # bias repeats per output position: phase-interleaved layout is
    # [r0c0, r0c1, r1c0, ...] so tile the [2] bias s times
    plan["b_convt"] = jnp.asarray(
        np.tile(np.asarray(p["dec_post"]["convt"]["bias"]), s)[None, None],
        dtype)
    return plan


def _frame_plan_keys(n_enc: int) -> tp.List[str]:
    keys = ["w_enc_pre", "b_enc_pre"]
    for i in range(n_enc):
        keys += [f"w_enc{i}", f"b_enc{i}"]
    keys += ["w_rf_pre_lin", "w_rf_pre", "b_rf_pre",
             "w_rf_post_lin", "w_rf_post", "b_rf_post"]
    for i in range(n_enc):
        keys += [f"w_dec{i}_x", f"w_dec{i}_s", f"b_dec{i}_1",
                 f"w_dec{i}_2", f"b_dec{i}_2"]
    keys += ["w_post_x", "w_post_s", "b_post",
             "w_convt_a", "w_convt_b", "b_convt"]
    return keys


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _silu(x: Array) -> Array:
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _conv_k(x: Array, taps, bias: Array, k: int) -> Array:
    """Same-padded k-tap freq conv on [B, F, C] via shifted matmuls."""
    b_, f, _ = x.shape
    pad = (k - 1) // 2
    zeros = jnp.zeros((b_, pad) + x.shape[2:], x.dtype)
    xp = jnp.concatenate([zeros, x, zeros], axis=1)
    acc = _mm(xp[:, 0:f].reshape(b_ * f, -1), taps[0])
    for j in range(1, k):
        acc = acc + _mm(xp[:, j:j + f].reshape(b_ * f, -1), taps[j])
    return (acc + bias.astype(jnp.float32)).reshape(b_, f, -1).astype(x.dtype)


def _freq_lin(x: Array, w: Array) -> Array:
    """[B, F_in, C] x [F_in, F_out] -> [B, F_out, C] (contract sublanes)."""
    b_, f_in, c = x.shape
    xt = x.swapaxes(1, 2).reshape(b_ * c, f_in)
    y = _mm(xt, w).astype(x.dtype)
    return y.reshape(b_, c, w.shape[1]).swapaxes(1, 2)


def _frame_kernel(num_blocks: int, num_heads: int, n_enc: int,
                  enc_ks: tp.Tuple[int, ...], batch: int, f_enc: int,
                  freq_pad: int, block_freq: int, channels: int,
                  block_channels: int, stride: int, resnet: bool,
                  mask: tp.Optional[str], *refs):
    n_frame_keys = len(_frame_plan_keys(n_enc))
    (x_ref, h_ref, *wrefs, mask_out, h_out) = refs
    frame = dict(zip(_frame_plan_keys(n_enc), wrefs[:n_frame_keys]))
    stack_plan = dict(zip(_PLAN_KEYS, wrefs[n_frame_keys:]))
    b_, c, cc = batch, channels, block_channels
    dt = x_ref.dtype

    # --- encoder PreNet: pre-reshaped strided conv == 2-tap valid conv ---
    x0 = x_ref[:]                                        # [B, F_enc+1, s*2]
    w = frame["w_enc_pre"]
    acc = (_mm(x0[:, :f_enc].reshape(b_ * f_enc, -1), w[0])
           + _mm(x0[:, 1:].reshape(b_ * f_enc, -1), w[1])
           + frame["b_enc_pre"][:].astype(jnp.float32))
    x = _silu(acc.astype(dt)).reshape(b_, f_enc, c)
    skips = [x]
    for i in range(n_enc):
        x_in = x
        x = _silu(_conv_k(x, frame[f"w_enc{i}"], frame[f"b_enc{i}"][:],
                          enc_ks[i]))
        skips.append(x)
        if resnet:
            x = x + x_in

    # --- rf_pre: F resample + 1x1 conv (no act) ---
    x_res = x
    y = _freq_lin(x, frame["w_rf_pre_lin"][:])           # [B, F', C]
    y = (_mm(y.reshape(b_ * block_freq, c), frame["w_rf_pre"][:])
         + frame["b_rf_pre"][:].astype(jnp.float32)).astype(dt)
    # pad the block-freq axis for the stack (padded rows junk-but-isolated)
    y = y.reshape(b_, block_freq, cc)
    if freq_pad != block_freq:
        y = jnp.concatenate(
            [y, jnp.zeros((b_, freq_pad - block_freq, cc), dt)], axis=1)

    # --- the K-block stack (shared with ops/rnnformer_stack.py) ---
    y = stack_math(y.reshape(b_ * freq_pad, cc), lambda i: h_ref[i],
                   lambda i, h: h_out.__setitem__(i, h), stack_plan,
                   num_blocks, num_heads, b_, freq_pad, cc)
    y = y.reshape(b_, freq_pad, cc)[:, :block_freq]

    # --- rf_post: F resample back + 1x1 conv (no act) ---
    y = _freq_lin(y, frame["w_rf_post_lin"][:])          # [B, F_enc, C']
    x = (_mm(y.reshape(b_ * f_enc, cc), frame["w_rf_post"][:])
         + frame["b_rf_post"][:].astype(jnp.float32)).astype(dt)
    x = x.reshape(b_, f_enc, c)
    if resnet:
        x = x + x_res

    # --- decoder: split-weight skip concat + k-tap conv ---
    for i in range(n_enc):
        x_in = x
        skip = skips.pop()
        y = (_mm(x.reshape(b_ * f_enc, c), frame[f"w_dec{i}_x"][:])
             + _mm(skip.reshape(b_ * f_enc, c), frame[f"w_dec{i}_s"][:])
             + frame[f"b_dec{i}_1"][:].astype(jnp.float32))
        y = _silu(y.astype(dt)).reshape(b_, f_enc, c)
        k = enc_ks[n_enc - 1 - i]
        x = _silu(_conv_k(y, frame[f"w_dec{i}_2"], frame[f"b_dec{i}_2"][:],
                          k))
        if resnet:
            x = x + x_in

    # --- dec_post conv (skip = enc_pre output) ---
    skip = skips.pop()
    y = (_mm(x.reshape(b_ * f_enc, c), frame["w_post_x"][:])
         + _mm(skip.reshape(b_ * f_enc, c), frame["w_post_s"][:])
         + frame["b_post"][:].astype(jnp.float32))
    y = _silu(y.astype(dt)).reshape(b_, f_enc, c)

    # --- ConvTranspose1d as stride phase matmuls ---
    zeros = jnp.zeros((b_, 1, c), dt)
    y_prev = jnp.concatenate([zeros, y[:, :-1]], axis=1)   # x[m-1]
    y_next = jnp.concatenate([y[:, 1:], zeros], axis=1)    # x[m+1]
    rows = b_ * f_enc
    wa, wb = frame["w_convt_a"], frame["w_convt_b"]
    half = stride // 2
    phases = []
    for r in range(stride):
        other = y_prev if r < half else y_next
        ph = (_mm(y.reshape(rows, c), wa[r])
              + _mm(other.reshape(rows, c), wb[r]))
        phases.append(ph)
    out = (jnp.concatenate(phases, axis=-1).reshape(b_, f_enc, stride * 2)
           + frame["b_convt"][:].astype(jnp.float32))     # + bias per (r, c)
    if mask == "sigmoid":
        out = jax.nn.sigmoid(out)
    elif mask == "tanh":
        out = jnp.tanh(out)
    mask_out[:] = out.astype(dt)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("num_blocks", "num_heads", "n_enc", "enc_ks",
                              "f_enc", "block_freq", "stride", "resnet",
                              "mask", "interpret", "batch_tile"))
def fused_frame_step(
    plan: Params, x: Array, h: Array, *, num_blocks: int, num_heads: int,
    n_enc: int, enc_ks: tp.Tuple[int, ...], f_enc: int, block_freq: int,
    stride: int, resnet: bool, mask: tp.Optional[str],
    interpret: tp.Optional[bool] = None,
    batch_tile: tp.Optional[int] = None,
) -> tp.Tuple[Array, Array]:
    """One whole spec->mask frame.

    x: [B, F_enc+1, stride*2] (the strided-reshape of the compressed spec
    frame, done outside — a free reshape), h: [NB, B*Fp', C'] stacked GRU
    carries -> (mask8 [B, F_enc, stride*2] phase-interleaved mask — reshape
    to [B, F_enc*stride, 2] outside — and h_new).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b = x.shape[0]
    fp = pad_freq(block_freq)
    nb = h.shape[0]
    if fp != block_freq:
        h = jnp.pad(h.reshape(nb, b, block_freq, -1),
                    ((0, 0), (0, 0), (0, fp - block_freq), (0, 0)))
        h = h.reshape(nb, b * fp, -1)
    cc = h.shape[-1]
    c = plan["b_enc_pre"].shape[-1]
    tile = (_auto_batch_tile(b, max(fp, f_enc), num_heads)
            if batch_tile is None else batch_tile)
    assert b % tile == 0, (b, tile)

    keys = _frame_plan_keys(n_enc)
    kernel = functools.partial(
        _frame_kernel, num_blocks, num_heads, n_enc, enc_ks, tile, f_enc,
        fp, block_freq, c, cc, stride, resnet, mask)

    def full(a):
        del a
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    mask8, h_out = pl.pallas_call(
        kernel,
        grid=(b // tile,),
        out_shape=(jax.ShapeDtypeStruct((b, f_enc, stride * 2), x.dtype),
                   jax.ShapeDtypeStruct(h.shape, h.dtype)),
        in_specs=[
            pl.BlockSpec((tile, f_enc + 1, stride * 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tile * fp, cc), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            *[full(plan[k]) for k in keys],
            *[full(plan["stack"][k]) for k in _PLAN_KEYS],
        ],
        out_specs=(
            pl.BlockSpec((tile, f_enc, stride * 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tile * fp, cc), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, h, *[plan[k] for k in keys],
      *[plan["stack"][k] for k in _PLAN_KEYS])
    if fp != block_freq:
        h_out = h_out.reshape(nb, b, fp, cc)[:, :, :block_freq]
        h_out = h_out.reshape(nb, b * block_freq, cc)
    return mask8, h_out


__all__ = ["plan_frame", "fused_frame_step"]
