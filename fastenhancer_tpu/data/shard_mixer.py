"""DynamicMixer: the device-side mixing engine for the shard pipeline.

Reference: utils/data/shard_on_the_fly.py:1237-1411 — pure math, no
probability decisions (those live in ShardDataset):

  1. batched FFT RIR convolution (:1083-1103);
  2. dereverberation target synthesis: early_rir / weighted_rir / rts
     (arXiv 2204.08765) / anechoic (:1110-1201);
  3. dBFS normalization via segmental RMS (:1341-1361);
  4. SER echo mixing (:1363-1379, zeros pass through);
  5. SNR noise mixing (:1381-1391);
  6. joint peak clip (:1393-1400).

The reference runs this on GPU between the DataLoader and the train step;
here it is one jittable function fused into the training program. Random
dBFS/SNR draws use a JAX PRNG key (reproducible, no host round-trip).
"""
from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp

from ..ops import segmental_rms

Array = jax.Array


def batch_convolve_rir(speech: Array, rirs: Array) -> Array:
    """Causal linear convolution per item; speech [B,1,T], rirs [B,1,T_rir]."""
    t = speech.shape[-1]
    t_rir = rirs.shape[-1]
    if t_rir == 1:
        return speech * rirs
    n = 1 << (t + t_rir - 2).bit_length()
    y = jnp.fft.rfft(speech, n=n) * jnp.fft.rfft(rirs, n=n)
    return jnp.fft.irfft(y, n=n)[..., :t].astype(speech.dtype)


def get_early_rir(rirs: Array, onset: Array, early_rir_sec: float = 0.05,
                  fs: int = 16_000) -> Array:
    b, _, t = rirs.shape
    stop = (onset + int(early_rir_sec * fs)).reshape(b, 1, 1)
    idx = jnp.arange(t).reshape(1, 1, t)
    return rirs * (idx < stop)


def get_weighted_rir(rirs: Array, onset: Array, t60_max: float = 0.3,
                     fs: int = 16_000) -> Array:
    b, _, t = rirs.shape
    tt = jnp.arange(t, dtype=jnp.float32).reshape(1, 1, t) / fs
    t0 = onset.astype(jnp.float32).reshape(b, 1, 1) / fs
    decay = jnp.exp(-(tt - t0) * 6.0 * math.log(10.0) / t60_max)
    return rirs * jnp.where(tt > t0, decay, 1.0)


def get_rts_rir(rirs: Array, onset: Array, t60: Array,
                t60_max: float = 0.15, fs: int = 16_000) -> Array:
    """Reverberation Time Shortening (arXiv 2204.08765)."""
    b, _, t = rirs.shape
    onset = onset.reshape(b, 1, 1).astype(jnp.float32)
    t60 = t60.reshape(b, 1, 1).astype(jnp.float32)
    n = jnp.arange(t, dtype=jnp.float32).reshape(1, 1, t)
    # rows with t60 <= t60_max take the passthrough branch; clamp them away
    # from 0 so q stays finite (inf*0 at n==onset would NaN the masked branch)
    safe_t60 = jnp.maximum(t60, 1e-4)
    q = 3.0 / fs * (1.0 / t60_max - 1.0 / safe_t60)
    # clamp the exponent: rows with t60 <= t60_max take the passthrough
    # branch anyway, but an unclamped 10^(+huge) would poison the where
    # with inf*0 NaNs under reverse-mode AD
    decay = 10.0 ** jnp.minimum(-q * (n - onset), 0.0)
    weighted = rirs * jnp.where(n > onset, decay, 1.0)
    return jnp.where(t60 <= t60_max, rirs, weighted)


class DynamicMixer:
    def __init__(
        self,
        speech_dbFS: tp.Sequence[float] = (-30.0, -15.0),
        ser_real: tp.Sequence[float] = (-10.0, 20.0),
        ser: tp.Sequence[float] = (-10.0, 20.0),
        snr: tp.Sequence[float] = (0.0, 30.0),
        sampling_rate: int = 16_000,
        seg_window_ms: int = 100,
        seg_rel_threshold: float = -25.0,
        seg_abs_threshold: tp.Optional[float] = -50.0,
        rir_target_type: tp.Optional[str] = None,
        early_rir_sec: float = 0.05,
        t60_max: float = 0.3,
    ):
        assert rir_target_type in (None, "early_rir", "weighted_rir",
                                   "anechoic", "rts")
        self.dbFS = tuple(speech_dbFS)
        self.ser_real = tuple(ser_real)
        self.ser = tuple(ser)
        self.snr = tuple(snr)
        self.sr = sampling_rate
        self.seg_window_ms = seg_window_ms
        self.seg_rel_thr = seg_rel_threshold
        self.seg_abs_thr = seg_abs_threshold
        self.rir_target_type = rir_target_type
        self.early_rir_sec = early_rir_sec
        self.t60_max = t60_max

    def __call__(
        self,
        key: Array,
        speech: Array,
        speech_clean: tp.Optional[Array] = None,
        noise: tp.Optional[Array] = None,
        rir: tp.Optional[Array] = None,
        rir_onset: tp.Optional[Array] = None,
        rir_t60: tp.Optional[Array] = None,
        echo: tp.Optional[Array] = None,
        is_real: tp.Optional[Array] = None,
    ) -> tp.Dict[str, Array]:
        """All arrays [B, 1, T] ([B] for onset/t60/is_real). Returns
        {"speech" (noisy input), "speech_clean" (target), "dbFS", "snr",
        "ser"}."""
        b = speech.shape[0]
        k_dbfs, k_snr, k_ser_r, k_ser_s = jax.random.split(key, 4)

        # 1. RIR convolution
        inp = speech
        if rir is not None:
            inp = batch_convolve_rir(inp, rir)

        # 2. dereverberated target
        clean_out = None
        if speech_clean is not None:
            if self.rir_target_type == "anechoic" or rir is None:
                rir_target = None
            elif self.rir_target_type is None:
                rir_target = rir
            elif self.rir_target_type == "early_rir":
                rir_target = get_early_rir(rir, rir_onset, self.early_rir_sec,
                                           self.sr)
            elif self.rir_target_type == "rts":
                rir_target = get_rts_rir(rir, rir_onset, rir_t60,
                                         self.t60_max, self.sr)
            else:
                rir_target = get_weighted_rir(rir, rir_onset, self.t60_max,
                                              self.sr)
            clean_out = (speech_clean if rir_target is None
                         else batch_convolve_rir(speech_clean, rir_target))

        # 3. dBFS normalization from the REVERBERANT input
        rms = segmental_rms(inp[:, 0], sr=self.sr,
                            window_ms=self.seg_window_ms,
                            relative_threshold_db=self.seg_rel_thr,
                            absolute_threshold_db=None)
        dbfs = jax.random.uniform(k_dbfs, (b,), minval=self.dbFS[0],
                                  maxval=self.dbFS[1])
        target_rms = (10.0 ** (dbfs / 20.0)).reshape(b, 1, 1)
        scale = target_rms / jnp.maximum(rms, 1e-10)
        inp = inp * scale
        if clean_out is not None:
            clean_out = clean_out * scale

        # 4. SER echo mixing (reference :1363-1379; zero echo rows: rms ==
        # +inf -> scale 0, so they add nothing). is_real picks the SER range
        # for recorded (real) vs simulated echo pairs.
        ser = None
        if echo is not None:
            rms_echo = segmental_rms(echo[:, 0], sr=self.sr,
                                     window_ms=self.seg_window_ms,
                                     relative_threshold_db=self.seg_rel_thr,
                                     absolute_threshold_db=self.seg_abs_thr)
            ser_r = jax.random.uniform(k_ser_r, (b,), minval=self.ser_real[0],
                                       maxval=self.ser_real[1])
            ser_s = jax.random.uniform(k_ser_s, (b,), minval=self.ser[0],
                                       maxval=self.ser[1])
            real = (is_real if is_real is not None
                    else jnp.zeros((b,), bool)).astype(bool)
            ser = jnp.where(real, ser_r, ser_s)
            echo_scale = target_rms / jnp.maximum(
                rms_echo * 10.0 ** (ser.reshape(b, 1, 1) / 20.0), 1e-10)
            echo_scale = jnp.where(jnp.isfinite(echo_scale), echo_scale, 0.0)
            inp = inp + echo_scale * echo

        # 5. SNR noise mixing (zeros add nothing)
        snr = None
        if noise is not None:
            rms_noise = segmental_rms(noise[:, 0], sr=self.sr,
                                      window_ms=self.seg_window_ms,
                                      relative_threshold_db=self.seg_rel_thr,
                                      absolute_threshold_db=self.seg_abs_thr)
            snr = jax.random.uniform(k_snr, (b,), minval=self.snr[0],
                                     maxval=self.snr[1])
            snr_v = snr.reshape(b, 1, 1)
            noise_scale = target_rms / jnp.maximum(
                rms_noise * 10.0 ** (snr_v / 20.0), 1e-10)
            # silent noise rows: rms == +inf -> scale 0 (reference zeros add)
            noise_scale = jnp.where(jnp.isfinite(noise_scale), noise_scale, 0.0)
            inp = inp + noise_scale * noise

        # 6. joint peak clip
        max_abs = jnp.max(jnp.abs(inp), axis=(-2, -1), keepdims=True)
        if clean_out is not None:
            max_abs = jnp.maximum(
                max_abs, jnp.max(jnp.abs(clean_out), axis=(-2, -1),
                                 keepdims=True))
        denom = jnp.where(max_abs > 1.0, max_abs + 1e-5, 1.0)
        inp = inp / denom
        if clean_out is not None:
            clean_out = clean_out / denom
        return {"speech": inp, "speech_clean": clean_out, "dbFS": dbfs,
                "snr": snr, "ser": ser}
