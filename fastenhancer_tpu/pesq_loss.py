"""Differentiable PESQ-inspired training loss (JAX).

The reference trains its Voicebank-Demand 16 kHz recipes with the external
`torch_pesq` package (reference: losses.py:150-162, weight 1e-3,
configs/fastenhancer/t.yaml:79-80); its DNS and 48 kHz recipes train without
it. That package is not available here, so this module provides the same
capability — a differentiable perceptual-quality loss under the `pesq`
config key — implemented from the structure of ITU-T P.862 (the published
basis of torch_pesq):

  1. 32 ms / 50% overlap Hann STFT power spectrum;
  2. Bark-band integration (49 bands on the P.862 Bark scale);
  3. partial gain equalization between reference and degraded Bark spectra;
  4. Zwicker-law loudness transform;
  5. symmetric + asymmetric disturbances with the P.862 masking deadzone,
     L2 over Bark, Lp over time;
  6. MOS = 4.5 - 0.1 d_sym - 0.0309 d_asym, loss = (4.5 - MOS) / 3.6.

DOCUMENTED DEVIATION: this is a faithful re-derivation of the published
algorithm, not a numerical clone of torch_pesq — training recipes using the
`pesq` loss therefore match the reference in kind (a differentiable
PESQ-shaped regularizer at weight 1e-3), not bit-for-bit.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _bark_bands(n_freq: int, sr: int, n_bark: int = 49) -> np.ndarray:
    """[n_bark, n_freq] triangular-ish rectangular Bark integration matrix."""
    f = np.linspace(0, sr / 2, n_freq)
    bark = 6.0 * np.arcsinh(f / 600.0)  # Wang/P.862-style Bark warp
    edges = np.linspace(bark[0], bark[-1], n_bark + 1)
    mat = np.zeros((n_bark, n_freq), np.float32)
    for i in range(n_bark):
        sel = (bark >= edges[i]) & (bark < edges[i + 1])
        if not sel.any():
            sel[np.argmin(np.abs(bark - edges[i]))] = True
        mat[i, sel] = 1.0 / sel.sum()
    return mat


class PESQLoss:
    """loss(ref, deg) -> scalar in [0, ~1] (0 == indistinguishable)."""

    N_FFT = 512
    HOP = 256

    def __init__(self, sample_rate: int = 16_000, factor: float = 1.0):
        assert sample_rate == 16_000, "PESQ loss is defined at 16 kHz"
        self.sr = sample_rate
        self.factor = factor
        self.bark = jnp.asarray(_bark_bands(self.N_FFT // 2 + 1, sample_rate))
        self.window = jnp.asarray(
            (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(self.N_FFT)
                                / self.N_FFT)).astype(np.float32))
        # absolute hearing threshold per band (simplified P.862 curve)
        f_centers = np.linspace(0, sample_rate / 2, 49)
        thr_db = 3.64 * (f_centers / 1000 + 1e-2) ** -0.8 \
            - 6.5 * np.exp(-0.6 * ((f_centers / 1000) - 3.3) ** 2) \
            + 1e-3 * (f_centers / 1000) ** 4
        self.abs_thresh = jnp.asarray(
            (10.0 ** (np.clip(thr_db, -10, 96) / 10.0)).astype(np.float32))

    def _bark_spectrum(self, wav: Array) -> Array:
        """[B, T] -> [B, frames, 49] Bark power spectrum."""
        b, t = wav.shape
        n = (t - self.N_FFT) // self.HOP + 1
        idx = (np.arange(n)[:, None] * self.HOP
               + np.arange(self.N_FFT)[None, :])
        frames = wav[:, idx] * self.window
        spec = jnp.fft.rfft(frames, axis=-1)
        power = jnp.square(jnp.abs(spec))
        return power @ self.bark.T

    def __call__(self, ref: Array, deg: Array) -> Array:
        """ref/deg: [B, T] waveforms (same length). Batch-mean scalar."""
        return jnp.mean(self.items(ref, deg))

    def items(self, ref: Array, deg: Array) -> Array:
        """Per-item loss, shape [B] (for masked batch means)."""
        # level alignment: scale both to a common active power
        def norm(x):
            p = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
            return x * jax.lax.rsqrt(jnp.maximum(p, 1e-12)) * 0.03

        ref = norm(ref)
        deg = norm(deg)
        pb_ref = self._bark_spectrum(ref) * 1e4  # [B, N, 49]
        pb_deg = self._bark_spectrum(deg) * 1e4

        # partial FREQUENCY compensation of the reference toward the
        # degraded spectrum (P.862 sec 10.2.2, clipped to +-20 dB): linear
        # filtering is partially forgiven, exactly as in the metric —
        # without this the loss over-penalizes bandwidth reduction relative
        # to true P.862 (tests/test_pesq_native.py pins the rank agreement)
        fnum = jnp.mean(pb_deg, axis=1, keepdims=True) + 1e3 * 1e-4
        fden = jnp.mean(pb_ref, axis=1, keepdims=True) + 1e3 * 1e-4
        pb_ref = pb_ref * jnp.clip(fnum / fden, 1e-2, 1e2)

        # partial gain equalization of the degraded signal (one scalar per
        # item over time and bands, clipped — the loss's simplification of
        # P.862's smoothed short-term gain)
        num = jnp.mean(pb_ref, axis=(1, 2), keepdims=True) + 1e3 * 1e-4
        den = jnp.mean(pb_deg, axis=(1, 2), keepdims=True) + 1e3 * 1e-4
        gain = jnp.clip(num / den, 3e-4, 5.0)
        pb_deg = pb_deg * gain

        # Zwicker loudness
        thr = self.abs_thresh

        def loudness(p):
            s = (thr / 0.5) ** 0.23 * ((0.5 + 0.5 * p / thr) ** 0.23 - 1.0)
            return jnp.maximum(s, 0.0) * 32.0

        l_ref = loudness(pb_ref)
        l_deg = loudness(pb_deg)

        # disturbance with masking deadzone (P.862 sec 10.2.4)
        d = l_deg - l_ref
        m = 0.25 * jnp.minimum(l_ref, l_deg)
        d = jnp.sign(d) * jnp.maximum(jnp.abs(d) - m, 0.0)

        # P.862 clips frame disturbances at 45 (sec 10.2.5); as a loss we
        # saturate smoothly (45*tanh(d/45)) so the bound holds but the
        # gradient never hard-zeros on heavily degraded batches
        def sat45(v):
            return 45.0 * jnp.tanh(v / 45.0)

        # symmetric: L2 over bark per frame, saturate, rms over frames
        d_sym = jnp.sqrt(jnp.mean(jnp.square(d), axis=-1) + 1e-12)
        d_sym = sat45(d_sym)
        d_sym = jnp.sqrt(jnp.mean(jnp.square(d_sym), axis=-1) + 1e-12)

        # asymmetric: penalize additive distortion harder
        ratio = (pb_deg + 50.0 * 1e-4) / (pb_ref + 50.0 * 1e-4)
        asym = jnp.clip(ratio ** 1.2, 0.0, 12.0)
        asym = jnp.where(asym < 3.0, 0.0, asym)
        d_asym = jnp.sum(jnp.abs(d) * asym, axis=-1) / 49.0
        d_asym = sat45(d_asym)
        d_asym = jnp.sqrt(jnp.mean(jnp.square(d_asym), axis=-1) + 1e-12)

        mos = 4.5 - 0.1 * d_sym - 0.0309 * d_asym
        loss = (4.5 - mos) / 3.6  # 0 (perfect) .. ~1.6 (both terms clipped)
        return self.factor * loss
