"""On-the-fly wrapper: SNR mixing (+ optional dynamic LPF) inside the step.

Reference: wrappers/ns_on_the_fly.py:78-152. The dataset yields (clean,
noise); mixing happens on device as part of the same XLA program as the
forward pass. Per-batch SNR/dBFS draws and per-item LPF kernels are sampled
on host each step and passed in as traced arrays, so nothing recompiles.
"""
from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np

from .ns import ModelWrapper as BaseModelWrapper
from ..data.ns_on_the_fly import SNRMixer, DynamicBatchLPF


class ModelWrapper(BaseModelWrapper):
    def __init__(self, hps, train: bool = False, rank: int = 0, device=None):
        super().__init__(hps, train, rank, device)
        self.snr_mixer = SNRMixer(sr=self.sr, **hps.data.snr_mixer.to_dict())
        if "dynamic_lpf" in hps.data:
            self.dynamic_lpf = DynamicBatchLPF(sampling_rate=self.sr,
                                               **hps.data.dynamic_lpf.to_dict())
        else:
            self.dynamic_lpf = DynamicBatchLPF(sampling_rate=self.sr, p_lpf=0.0)
        self._lpf_rng = np.random.default_rng(
            getattr(hps.train, "seed", 0) if "train" in hps else 0)

    def set_keys(self) -> None:
        self.keys = ["clean", "noise", "noisy"]
        # reverb recipes: the dataset draws a per-item RIR (identity delta
        # with prob 1-reverb_prob, data/ns_on_the_fly.py:145-154) and the
        # mixer convolves clean with it before SNR mixing (reference
        # capability: utils/data/ns_on_the_fly.py:207-223,357-364 — the
        # reference wrapper never requests "rir"; here reverb_prob>0
        # activates the full path)
        if self.hps.data.get("reverb_prob", 0) > 0:
            self.keys = self.keys + ["rir"]
        self.infer_keys = ["clean", "noise", "noisy", "wav_len"]

    def _device_batch(self, batch: tp.Mapping[str, np.ndarray],
                      keys: tp.Sequence[str], static_shapes: bool = False):
        """(clean, noise[, rir]) -> mixed (clean, noisy) on device; other
        modes (valid/pesq/infer use paired data) fall through to the base."""
        if "noise" not in batch:
            return super()._device_batch(batch, keys, static_shapes)
        mix_keys = ("clean", "noise", "rir") if "rir" in batch \
            else ("clean", "noise")
        arrs = {k: batch[k] for k in mix_keys}
        arrs["row_mask"] = np.ones(arrs["clean"].shape[0], np.float32)
        from ..parallel import pad_batch_to, shard_batch
        import jax

        if jax.process_count() > 1:
            # multihost: agree on global (rows, t) before assembling the
            # per-process row blocks; `rir` pads to its own cross-host max
            # (natural length, never cropped) — see ns._reconcile_multihost
            real_b = arrs["clean"].shape[0]
            arrs = self._reconcile_multihost(
                arrs, shared_time_keys=("clean", "noise"),
                static_shapes=static_shapes)
            dev = shard_batch(arrs, self.mesh)
        else:
            t = min(arrs[k].shape[-1] for k in ("clean", "noise"))
            t = (t // self.hop_size) * self.hop_size
            arrs = {k: (a[..., :t] if k in ("clean", "noise") else a)
                    for k, a in arrs.items()}
            padded, real_b = pad_batch_to(arrs, self.n_devices)
            dev = shard_batch(padded, self.mesh)

        snr, rms_target = self.snr_mixer.sample_params()
        rir = dev.get("rir")
        clean, _, noisy = self.snr_mixer(
            dev["clean"], dev["noise"],
            jnp.float32(snr), jnp.float32(rms_target), rir)
        if self.dynamic_lpf.p_lpf > 0:
            kernels = self.dynamic_lpf.sample_kernels(clean.shape[0],
                                                      self._lpf_rng)
            clean = self.dynamic_lpf(clean, kernels)
            noisy = self.dynamic_lpf(noisy, kernels)
        return {"clean": clean, "noisy": noisy,
                "row_mask": dev["row_mask"]}, real_b
