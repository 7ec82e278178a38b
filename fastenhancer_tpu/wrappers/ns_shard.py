"""Shard-pipeline wrapper: fixed steps/epoch over an infinite shard loader.

Reference: wrappers/ns_shard.py — keys speech/speech_clean/noise(/rir);
`steps_per_epoch` bounds an epoch (:50); the GPU DynamicMixer runs inside
the step (:56-57); per-phase wall timers (load/mixer+forward+backward)
print each step and sum per epoch (:44-114).

TPU form: the mixer is jitted together with the train step (one XLA
program); batches arrive length-bucketed, so each bucket size compiles once.
"""
from __future__ import annotations

import math
import time
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .ns import ModelWrapper as BaseModelWrapper
from ..data.shard_mixer import DynamicMixer
from ..parallel import pad_batch_to, shard_batch
from ..utils.terminal import verbose, clear_current_line


class ModelWrapper(BaseModelWrapper):
    def __init__(self, hps, train: bool = False, rank: int = 0, device=None):
        super().__init__(hps, train, rank, device)
        mixer_kwargs = hps.data.train.mixer.to_dict() \
            if "mixer" in hps.data.train else {}
        if "dereverberation" in hps.data:
            mixer_kwargs.update(hps.data.dereverberation.to_dict())
        self.mixer = DynamicMixer(sampling_rate=self.sr, **mixer_kwargs)
        self.steps_per_epoch: int = getattr(hps.train, "steps_per_epoch", 1000)
        self._mix_key = jax.random.PRNGKey(
            getattr(hps.train, "seed", 0) if "train" in hps else 0)

    def set_keys(self) -> None:
        self.keys = ["speech", "speech_clean", "noise"]
        # the valid/pesq datasets are paired NoiseSuppression dirs, not
        # shards (reference wrappers/ns_shard.py:34, consumed at
        # train.py:87 via getattr(wrapper, "val_keys", wrapper.keys))
        self.val_keys = ["clean", "noisy"]
        self.infer_keys = ["clean", "noisy", "wav_len"]

    def _mix_to_device(self, batch) -> tp.Tuple[tp.Dict[str, jnp.ndarray], int]:
        """ShardBatch -> mixed {clean, noisy} on device."""
        arrs = {"speech": batch.speech, "speech_clean": batch.speech_clean}
        if batch.noise is not None:
            arrs["noise"] = batch.noise
        if batch.rir is not None:
            arrs["rir"] = batch.rir
            arrs["rir_onset"] = batch.rir_onset
            arrs["rir_t60"] = batch.rir_t60
        if batch.echo is not None:
            arrs["echo"] = batch.echo
            arrs["is_real"] = batch.is_real.astype(bool)
        arrs["row_mask"] = np.ones(arrs["speech"].shape[0], np.float32)
        shared = tuple(k for k in ("speech", "speech_clean", "noise", "echo")
                       if k in arrs)
        if jax.process_count() > 1:
            # multihost: per-process duration-bucketed batches have
            # different (rows, t) — agree on the global shape first
            # (shared waveforms pad to the hop-floored cross-host max;
            # `rir` pads to its own natural-length max; rows pad masked).
            # See ns._reconcile_multihost. Never static: bucketing draws
            # differ per step by design.
            real_b = arrs["speech"].shape[0]
            arrs = self._reconcile_multihost(arrs, shared_time_keys=shared)
            dev = shard_batch(arrs, self.mesh)
        else:
            t = (arrs["speech"].shape[-1] // self.hop_size) * self.hop_size
            for k in shared:
                arrs[k] = arrs[k][..., :t]
            padded, real_b = pad_batch_to(arrs, self.n_devices)
            dev = shard_batch(padded, self.mesh)
        self._mix_key, sub = jax.random.split(self._mix_key)
        mixed = self.mixer(
            sub, dev["speech"], dev["speech_clean"], dev.get("noise"),
            dev.get("rir"), dev.get("rir_onset"), dev.get("rir_t60"),
            echo=dev.get("echo"), is_real=dev.get("is_real"))
        return {"clean": mixed["speech_clean"][:, 0],
                "noisy": mixed["speech"][:, 0],
                "row_mask": dev["row_mask"]}, real_b

    def train_epoch(self, dataloader) -> tp.Dict[str, tp.Any]:
        self.loss.initialize()
        max_items = self.steps_per_epoch
        pad = int(math.log10(max(max_items, 1))) + 1
        t_load = t_step = 0.0
        t0 = time.perf_counter()
        it = iter(dataloader)

        idx = 0
        while idx < max_items:
            t_mark = time.perf_counter()
            try:
                batch = next(it)
            except StopIteration:
                it = iter(dataloader)  # infinite epoch semantics
                continue
            t_load += time.perf_counter() - t_mark
            idx += 1

            t_mark = time.perf_counter()
            dev_batch, real_b = self._mix_to_device(batch)
            self.state, metrics = self.train_step(self.state, dev_batch,
                                                  self._lrs())
            # lazy device scalars (see ns.py): t_step is host dispatch
            # time; the print-time fetch below blocks on device completion,
            # so the printed load/step split plus the wall total stay honest
            per_loss = {k.split("/", 1)[1]: v
                        for k, v in metrics.items()
                        if k.startswith("loss/") and k != "loss/total"}
            t_step += time.perf_counter() - t_mark
            self.loss.accumulate(per_loss, real_b)
            if verbose() and idx % self.print_interval == 0:
                dt = time.perf_counter() - t0
                print(f"\rEpoch {self.epoch} - Train "
                      f"{idx:{pad}d}/{max_items}"
                      f"{self.loss.print()}"
                      f"  [load {t_load:.1f}s step {t_step:.1f}s"
                      f" | {int(dt)}/{int(dt / idx * max_items)} sec]",
                      end="", flush=True)
            if self.profiler is not None:
                self.profiler.step()
            self.scheduler.warmup_step()
            if self.test and idx >= 50:
                break
        if self.profiler is not None:
            self.profiler.close()
        if verbose():
            clear_current_line()
            print(f"epoch {self.epoch} timing: load {t_load:.1f}s "
                  f"mix+step {t_step:.1f}s")
        if not self.scheduler.requires_metric:
            self.scheduler.step()  # else: valid_epoch steps with the metric
        return {"scalars": self.loss.reduce()}
