"""Active-segment RMS — the reference's only accelerator-native kernel pair.

Reference: utils/segmental_rms.py — a Triton frame-power kernel + masked-mean
reduction (:69-118) with a torch fallback (:19-65). Semantics: split the
waveform into `window_ms` frames, keep frames whose mean power exceeds
max(max_power * rel_ratio, abs_floor), return sqrt of the mean power of kept
frames ([B, 1, 1]; +inf when nothing is active).

TPU forms:
  * `segmental_rms` — pure XLA: one reshape-mean + masked reduction. XLA
    fuses this into two passes over HBM; this is the default.
  * `segmental_rms_pallas` — explicit Pallas kernel (one batch row per
    program, frame power + two-threshold masked mean in VMEM, single pass).
    Used on TPU for long inputs where the fused-pass latency matters;
    numerically identical.
"""
from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp

Array = jax.Array


def _prep(wav: Array, sr: int, window_ms: int) -> tp.Tuple[Array, int, int]:
    b = wav.shape[0]
    wav = wav.reshape(b, -1)
    win = int(sr * window_ms / 1000)
    n = wav.shape[-1] // win
    return wav, win, n


def segmental_rms(
    wav: Array,
    sr: int = 16_000,
    window_ms: int = 100,
    relative_threshold_db: float = -25.0,
    absolute_threshold_db: tp.Optional[float] = -50.0,
) -> Array:
    """[B, T] (or [B, 1, T]) -> [B, 1, 1] active-segment RMS."""
    wav, win, n = _prep(wav, sr, window_ms)
    b = wav.shape[0]
    if n == 0:
        return jnp.sqrt(jnp.mean(jnp.square(wav), axis=-1,
                                 keepdims=True))[:, :, None]
    seg_pow = jnp.mean(
        jnp.square(wav[:, : n * win]).reshape(b, n, win), axis=-1)  # [B, N]
    rel_ratio = 10.0 ** (relative_threshold_db / 10.0)
    threshold = jnp.max(seg_pow, axis=-1, keepdims=True) * rel_ratio
    if absolute_threshold_db is not None:
        threshold = jnp.maximum(threshold, 10.0 ** (absolute_threshold_db / 10.0))
    active = seg_pow > threshold
    n_active = jnp.sum(active, axis=-1, keepdims=True)
    mean_pow = (jnp.sum(seg_pow * active, axis=-1, keepdims=True)
                / jnp.maximum(n_active, 1))
    rms = jnp.where(n_active > 0, jnp.sqrt(mean_pow), jnp.inf)
    return rms[:, :, None]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def segmental_rms_pallas(
    wav: Array,
    sr: int = 16_000,
    window_ms: int = 100,
    relative_threshold_db: float = -25.0,
    absolute_threshold_db: tp.Optional[float] = -50.0,
) -> Array:
    """Pallas kernel form: one grid program per batch row, frame power and
    the two-threshold masked mean fused in VMEM (single HBM read)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wav, win, n = _prep(wav, sr, window_ms)
    b, t = wav.shape
    if n == 0:
        return segmental_rms(wav, sr, window_ms, relative_threshold_db,
                             absolute_threshold_db)
    t_valid = n * win
    rel_ratio = 10.0 ** (relative_threshold_db / 10.0)
    abs_floor = (10.0 ** (absolute_threshold_db / 10.0)
                 if absolute_threshold_db is not None else 0.0)

    def kernel(wav_ref, out_ref):
        x = wav_ref[0, :t_valid]
        seg_pow = jnp.mean(jnp.square(x).reshape(n, win), axis=-1)  # [N]
        seg_pow = seg_pow.reshape(1, n)  # TPU wants >=2D
        threshold = jnp.maximum(jnp.max(seg_pow) * rel_ratio, abs_floor)
        active = seg_pow > threshold
        n_active = jnp.sum(active)
        mean_pow = jnp.sum(seg_pow * active) / jnp.maximum(n_active, 1)
        out_ref[0, 0] = jnp.where(n_active > 0, jnp.sqrt(mean_pow),
                                  jnp.inf)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), wav.dtype),
    )(wav)
    return out[:, :, None]
