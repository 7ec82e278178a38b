"""Training losses as pure jit-safe JAX functions.

Re-designed from the reference's torch loss registry (reference: losses.py).
Each loss is a pure fn `(wav_hat, wav, spec_hat, spec) -> scalar`; the
`Losses` aggregator mirrors the reference's config contract (a dict of
{name: kwargs} with a `weight` each, reference: losses.py:176-232) but is
functional: `calculate` returns `(total, per_loss_dict)` so it can live
inside a pjit'd train step. Under pjit with the batch axis sharded, the
`jnp.mean` reductions are global means — equivalent to the reference's
DDP loss averaging without any explicit collective.

Epoch-level accumulation (the reference's running sums + dist.reduce,
losses.py:215-232) happens host-side in the wrapper from the returned dict.
"""
from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp

from .functional import STFTConfig, compressed_stft

Array = jax.Array


def _item_mean(x: Array) -> Array:
    """Mean over all non-batch axes -> [B]."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def si_snr_items(wav_hat: Array, wav: Array, eps: float = 1e-7) -> Array:
    """Per-item negative SI-SNR in dB, shape [B] (reference: losses.py:27-37).

    Matches the reference exactly, including the eps placement inside the
    log10 and the denominator.
    """
    s1, s2 = wav_hat, wav
    s1_s2 = jnp.sum(s1 * s2, axis=-1, keepdims=True)
    s2_s2 = jnp.sum(s2 * s2, axis=-1, keepdims=True)
    s_target = s1_s2 / (s2_s2 + eps) * s2
    e_noise = s1 - s_target
    target_norm = jnp.sum(s_target * s_target, axis=-1, keepdims=True)
    noise_norm = jnp.sum(e_noise * e_noise, axis=-1, keepdims=True)
    snr = jnp.log10(target_norm / (noise_norm + eps) + eps)
    return -10.0 * _item_mean(snr)


def si_snr_loss(wav_hat: Array, wav: Array, eps: float = 1e-7) -> Array:
    return jnp.mean(si_snr_items(wav_hat, wav, eps))


def wav_l1_items(wav_hat: Array, wav: Array) -> Array:
    return _item_mean(jnp.abs(wav_hat - wav))


def wav_l1_loss(wav_hat: Array, wav: Array) -> Array:
    return jnp.mean(wav_l1_items(wav_hat, wav))


def mag_mse_items(spec_hat: Array, spec: Array) -> Array:
    """Per-item MSE over magnitudes of [..., 2] re/im specs (reference:
    losses.py:132-139).

    sqrt floored (normal-range) so exactly-zero bins (zero-padded batch rows) don't
    produce inf gradients; forward change is below float32 resolution."""
    m1 = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(spec_hat), -1), 1e-30))
    m2 = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(spec), -1), 1e-30))
    return _item_mean(jnp.square(m1 - m2))


def mag_mse_loss(spec_hat: Array, spec: Array) -> Array:
    return jnp.mean(mag_mse_items(spec_hat, spec))


def complex_mse_items(spec_hat: Array, spec: Array) -> Array:
    return _item_mean(jnp.square(spec_hat - spec))


def complex_mse_loss(spec_hat: Array, spec: Array) -> Array:
    return jnp.mean(complex_mse_items(spec_hat, spec))


def _anti_wrap(x: Array) -> Array:
    two_pi = 2.0 * math.pi
    return jnp.abs(x - jnp.round(x / two_pi) * two_pi)


def phase_items(spec_hat: Array, spec: Array) -> Array:
    """Per-item anti-wrapping instantaneous-phase + group-delay + IAF losses
    (reference: losses.py:106-129). Specs are [B, F, T, 2]."""
    ph_hat = jnp.arctan2(spec_hat[..., 1], spec_hat[..., 0])
    ph = jnp.arctan2(spec[..., 1], spec[..., 0])
    ip = _item_mean(_anti_wrap(ph - ph_hat))
    gd = _item_mean(_anti_wrap(jnp.diff(ph, axis=1) - jnp.diff(ph_hat, axis=1)))
    iaf = _item_mean(_anti_wrap(jnp.diff(ph, axis=2) - jnp.diff(ph_hat, axis=2)))
    return ip + gd + iaf


def phase_loss(spec_hat: Array, spec: Array) -> Array:
    return jnp.mean(phase_items(spec_hat, spec))


class ConsistencyLoss:
    """Re-STFT MSE: both wavs re-analyzed through a (possibly different)
    compressed STFT (reference: losses.py:81-103). The wrapper injects the
    model's stft params when the config omits them (reference: wrappers/ns.py:84-88)."""

    def __init__(
        self,
        compression: float = 1.0,
        n_fft: int = 512,
        hop_size: int = 256,
        win_size: tp.Optional[int] = None,
        win_type: tp.Optional[str] = None,
    ):
        self.cfg = STFTConfig(
            n_fft=n_fft, hop_size=hop_size, win_size=win_size, win_type=win_type
        )
        self.compression = compression

    def items(self, wav_hat: Array, wav: Array) -> Array:
        spec_hat = compressed_stft(wav_hat, self.cfg, self.compression)
        spec = compressed_stft(wav, self.cfg, self.compression)
        return _item_mean(jnp.square(spec_hat - spec))

    def __call__(self, wav_hat: Array, wav: Array) -> Array:
        return jnp.mean(self.items(wav_hat, wav))


# name -> (input_type, per-item fn returning [B]). input_type: "wav" | "spec".
# (reference registry: losses.py:165-173)
def _make(name: str, kwargs: tp.Dict[str, tp.Any]) -> tp.Tuple[str, tp.Callable]:
    if name == "si_snr":
        eps = kwargs.get("eps", 1e-7)
        return "wav", lambda a, b: si_snr_items(a, b, eps)
    if name == "wav_l1":
        return "wav", wav_l1_items
    if name == "mag_mse":
        return "spec", mag_mse_items
    if name == "complex_mse":
        return "spec", complex_mse_items
    if name == "phase":
        return "spec", phase_items
    if name == "consistency":
        return "wav", ConsistencyLoss(**kwargs).items
    if name == "pesq":
        from .pesq_loss import PESQLoss  # heavy init; import lazily

        fn = PESQLoss(sample_rate=kwargs.get("sample_rate", 16_000))
        return "wav", lambda a, b: fn.items(b, a)  # torch_pesq order: (ref, deg)
    raise ValueError(f"unknown loss: {name}")


class Losses:
    """Aggregate weighted losses from a config dict {name: {weight, ...}}.

    `calculate` is pure and jit-safe. Host-side accumulation helpers
    (`accumulate` / `reduce`) mirror the reference's epoch bookkeeping.
    """

    def __init__(self, losses_cfg: tp.Mapping[str, tp.Mapping[str, tp.Any]]):
        self.weights: tp.Dict[str, float] = {}
        self.fns: tp.Dict[str, tp.Tuple[str, tp.Callable]] = {}
        for name, kwargs in dict(losses_cfg).items():
            kw = dict(kwargs)
            self.weights[name] = float(kw.pop("weight"))
            self.fns[name] = _make(name, kw)
        self._sums: tp.Dict[str, float] = {n: 0.0 for n in self.fns}
        self._n_items = 0

    # -- jit-safe ------------------------------------------------------------

    def calculate(
        self, wav_hat: Array, spec_hat: Array, wav: Array, spec: Array,
        row_mask: tp.Optional[Array] = None,
    ) -> tp.Tuple[Array, tp.Dict[str, Array]]:
        """row_mask [B] (1 real, 0 zero-padded row) restricts the batch mean
        to real items — the reference never feeds padded rows into a loss
        (its per-rank DataLoaders yield real items only; ragged eval is
        masked per item, reference scripts/metrics_ns.py:124-129)."""
        if row_mask is not None:
            w = row_mask.astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(w), 1.0)
            # substitute padded (zero) rows with row 0 — which is always
            # real, pads are appended (parallel.pad_batch_to) — so every
            # per-item loss stays finite-valued AND finite-gradiented
            # (arctan2(0,0) in the phase loss has a NaN derivative; NaN*0
            # would poison the masked mean's backward). The outer mask then
            # zeroes both the value and the gradient of substituted rows.
            mb = w > 0

            def _safe(x):
                m = mb.reshape((-1,) + (1,) * (x.ndim - 1))
                return jnp.where(m, x, jax.lax.stop_gradient(x[:1]))

            wav_hat, wav = _safe(wav_hat), _safe(wav)
            spec_hat, spec = _safe(spec_hat), _safe(spec)
        total = jnp.zeros((), wav.dtype)
        out: tp.Dict[str, Array] = {}
        for name, (input_type, fn) in self.fns.items():
            if input_type == "wav":
                items = fn(wav_hat, wav)
            else:
                items = fn(spec_hat, spec)
            if row_mask is None:
                val = jnp.mean(items)
            else:
                val = jnp.sum(items * w) / denom
            out[name] = val
            total = total + self.weights[name] * val
        return total, out

    # -- host-side epoch bookkeeping ------------------------------------------

    def initialize(self) -> None:
        self._sums = {n: 0.0 for n in self.fns}
        self._n_items = 0

    def accumulate(self, per_loss: tp.Mapping[str, tp.Any], batch_size: int) -> None:
        """Running sums. Device scalars are accumulated LAZILY (tiny async
        device adds, no host fetch) so the step loop never blocks on the
        chip; the sync happens at print()/get()/reduce() time. The
        reference accumulates on-GPU the same way (losses.py:40-61)."""
        for n, v in per_loss.items():
            self._sums[n] = self._sums[n] + v * batch_size
        self._n_items += batch_size

    def get(self, key: str) -> float:
        if key not in self._sums or self._n_items == 0:
            return 0.0
        return float(self._sums[key]) / self._n_items

    def print(self) -> str:
        return "".join(
            f"  {n}: {float(s) / max(self._n_items, 1):8.2e}"
            for n, s in self._sums.items()
        )

    def reduce(self) -> tp.Dict[str, float]:
        """Epoch means keyed 'loss/<name>' (reference: losses.py:215-232).

        Values were already global means per step under pjit, so no extra
        cross-device reduction is required here.
        """
        return {f"loss/{n}": self.get(n) for n in self.fns}
