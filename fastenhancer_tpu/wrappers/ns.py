"""Noise-suppression training wrapper — orchestration around the jitted step.

Rebuild of the reference ModelWrapper (reference: wrappers/ns.py:35-346) on
the TPU runtime: one host process drives all local devices through a single
donated pjit train step (grad psum + global-batch BN implicit; no DDP, no
GradScaler — bf16 compute with f32 master state replaces fp16+scaler, a
documented deviation for TPU).

Public surface (same as the reference): train_epoch / valid_epoch /
infer_epoch / calculate_metrics / save / load / get_lr.
"""
from __future__ import annotations

import math
import time
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..data import get_dataset_dataloader
from ..losses import Losses
from ..metrics import Metrics, sisdr
from ..models import get_model
from ..optim import get_optimizer, get_scheduler
from ..parallel import make_mesh, shard_batch, replicate, pad_batch_to
from ..train import make_train_step, make_valid_step, make_infer_fn
from ..train.checkpoint import save_checkpoint, latest_checkpoint, load_checkpoint
from ..utils.profiler import make_profiler
from ..utils.terminal import verbose, clear_current_line
from ..functional import stft as _stft_fn, STFTConfig


class ModelWrapper:
    def __init__(self, hps, train: bool = False, rank: int = 0, device=None):
        del rank, device  # single-process SPMD
        self.base_dir: str = hps.base_dir
        self.hps = hps
        self.model = get_model(hps.model, **hps.model_kwargs.to_dict())
        self.train_mode = train
        self.epoch = 0
        self.sr: int = hps.data.sampling_rate
        self.hop_size: int = hps.model_kwargs.hop_size
        self.keys: tp.List[str] = []
        self.infer_keys: tp.List[str] = []
        self.set_keys()

        seed = getattr(hps.train, "seed", 0) if "train" in hps else 0
        self.variables = self.model.init(jax.random.PRNGKey(seed))
        self.mesh = make_mesh()
        self.n_devices = self.mesh.devices.size

        self.infer_fn = make_infer_fn(self.model)
        self.state: tp.Dict[str, tp.Any] = {"variables": self.variables}
        self.metrics: tp.Optional[Metrics] = None
        self.scheduler = None
        self.test = False
        # multihost shape agreement (see _reconcile_multihost): train
        # batches are provably one static shape when the recipe fixes the
        # segment and drops ragged tails — then the per-step dims allgather
        # collapses to one cached call (no hot-path host sync)
        self._mh_dims_cache: tp.Dict[tuple, tuple] = {}
        self._mh_static_train = bool(
            "train" in hps
            and getattr(hps.data.get("train", {}), "segment_size", None)
            and getattr(hps.train, "drop_last", False))

        if train:
            hp = hps.train
            self.test = getattr(hp, "test", False)
            if self.test:
                hp.max_epochs = 1
            self.print_interval: int = getattr(hp, "print_interval", 1)
            self.plot_param_and_grad = getattr(hp, "plot_param_and_grad", False)
            self.profiler = make_profiler(hp, self.base_dir)
            # fp16:True in reference configs -> bf16 on TPU (no GradScaler)
            use_mixed = getattr(hp, "fp16", False) or getattr(hp, "bf16", False)
            self.compute_dtype = jnp.bfloat16 if use_mixed else None
            # train.remat: per-block/per-conv jax.checkpoint in the backward
            # (activation recompute). Lets the L recipe (batch 64 x 2 s,
            # reference configs/fastenhancer/l.yaml) train on one 16 GB chip;
            # math-identical, opt-in via `-p train.remat=True`.
            self.model.remat = bool(getattr(hp, "remat", False))

            if "consistency" in hp.losses:
                hp.losses.consistency["n_fft"] = hps.model_kwargs.n_fft
                hp.losses.consistency["hop_size"] = hps.model_kwargs.hop_size
                hp.losses.consistency["win_size"] = getattr(
                    hps.model_kwargs, "win_size", None)
                hp.losses.consistency["win_type"] = getattr(
                    hps.model_kwargs, "window", None)
            self.loss = Losses(hp.losses.to_dict())

            self.optim = get_optimizer(self.model, self.variables["params"], hp)
            self.scheduler = get_scheduler(self.optim, hp)
            self.train_step = make_train_step(
                self.model, self.loss, self.optim,
                clip_grad=getattr(hp, "clip_grad", None),
                clip_grad_kwargs=getattr(hp, "clip_grad_kwargs", None),
                compute_dtype=self.compute_dtype,
                return_grads=self.plot_param_and_grad,
                skip_nonfinite=getattr(hp, "skip_nonfinite_grads", False))
            self.valid_step = make_valid_step(self.model, self.loss,
                                              self.compute_dtype)
            self.state = {
                "variables": replicate(self.variables, self.mesh),
                "opt_state": replicate(self.optim.init(self.variables["params"]),
                                       self.mesh),
            }

            if "pesq" in hps:
                self.pesq_interval: int = hps.pesq.interval
                _, self.pesq_loader = get_dataset_dataloader(
                    hps, "pesq", ["clean", "noisy", "wav_len"],
                    n_devices=self.n_devices)
                self.metrics = Metrics(
                    num_workers=getattr(hps.pesq, "num_workers_executor", 8),
                    sr=self.sr,
                    **hps.pesq.metrics_to_calculate.to_dict())
            else:
                self.pesq_interval = hp.max_epochs + 1
                self.pesq_loader = None

    # -- keys ------------------------------------------------------------------

    def set_keys(self) -> None:
        self.keys = ["clean", "noisy"]
        self.infer_keys = self.keys + ["wav_len"]

    def get_lr(self) -> float:
        return self.scheduler.lrs[0] if self.scheduler else 0.0

    def _lrs(self):
        return jnp.asarray(self.scheduler.lrs, jnp.float32)

    # -- batch prep ------------------------------------------------------------

    def _device_batch(self, batch: tp.Mapping[str, np.ndarray],
                      keys: tp.Sequence[str], static_shapes: bool = False):
        """Trim to hop multiple, pad batch dim to device multiple, shard.

        Adds "row_mask" [B] f32 (1 real, 0 padded) so the jitted steps can
        exclude the zero-padded rows from losses and train-mode BN stats
        (the reference never feeds padded rows: its per-rank DataLoaders
        yield real items only)."""
        arrs = {k: batch[k] for k in keys if k in batch}
        b = next(iter(arrs.values())).shape[0]
        arrs["row_mask"] = np.ones(b, np.float32)
        if jax.process_count() > 1:
            # hop-floor AFTER the cross-host max so no host drops samples
            # another host will keep (see _reconcile_multihost)
            shared = tuple(k for k, a in arrs.items()
                           if k != "row_mask" and np.asarray(a).ndim > 1)
            arrs = self._reconcile_multihost(arrs, shared,
                                             static_shapes=static_shapes)
            return shard_batch(arrs, self.mesh), b
        t_raw = min(a.shape[-1] for a in arrs.values() if a.ndim > 1)
        t = (t_raw // self.hop_size) * self.hop_size
        arrs = {k: (a[..., :t] if a.ndim > 1 else a)
                for k, a in arrs.items()}
        padded, real_b = pad_batch_to(arrs, self.n_devices)
        return shard_batch(padded, self.mesh), real_b

    def _reconcile_multihost(self, arrs, shared_time_keys,
                             static_shapes: bool = False):
        """Pad this process's local arrays to the agreed GLOBAL shapes.

        Each process serves a disjoint batch stride (reference:
        DistributedSampler, utils/data/__init__.py:79-81), so the global
        step-k batch is the row-concat of every process's local batch. XLA
        needs one consistent global shape, agreed via one small host
        allgather per step:
          * `shared_time_keys` (waveforms sharing the sample axis) crop/pad
            to the hop-floored cross-host MAX time — identical to
            single-host collate's pad-to-batch-max, so a W-process run at
            batch B computes the exact same global batch as 1 process at
            W*B;
          * other >=2-D keys (e.g. `rir`, stored at its natural length) are
            zero-padded — never cropped — to their own cross-host max;
          * rows pad to a device multiple of the cross-host max row count
            with zero rows masked out via "row_mask".

        `static_shapes=True` (fixed-segment training with drop_last)
        promises every process's local dims repeat identically each step;
        the allgather then runs once and is cached — no per-step host sync.
        Every process takes the same branch (same promise, same local dims),
        so collectives stay in lockstep; a process whose dims change raises
        before any collective instead of deadlocking the others."""
        import zlib

        from jax.experimental import multihost_utils

        world = jax.process_count()
        n_local = max(self.n_devices // world, 1)
        keys = sorted(arrs)
        shared = [k for k in keys if k in shared_time_keys]
        pad_only = [k for k in keys if k not in shared_time_keys
                    and np.asarray(arrs[k]).ndim >= 2]
        b = int(np.asarray(arrs[keys[0]]).shape[0])
        t_shared = (min(int(np.asarray(arrs[k]).shape[-1]) for k in shared)
                    if shared else 0)
        # key-set fingerprint rides the dims vector: a config divergence
        # across processes fails loudly instead of mispairing columns
        fp = zlib.crc32(repr((keys, shared, pad_only)).encode()) & 0x7FFFFFFF
        sig = (fp, b, t_shared) + tuple(
            int(np.asarray(arrs[k]).shape[-1]) for k in pad_only)

        cached = self._mh_dims_cache.get(sig) if static_shapes else None
        if cached is None:
            if static_shapes and self._mh_dims_cache:
                raise RuntimeError(
                    "multihost static_shapes promised but the local batch "
                    f"dims changed (cached {sorted(self._mh_dims_cache)}, "
                    f"got {sig}); fixed-segment training must use "
                    "drop_last=True so every step has one batch shape")
            g = np.asarray(multihost_utils.process_allgather(
                np.asarray(sig, np.int64))).reshape(world, len(sig))
            if not (g[:, 0] == g[0, 0]).all():
                raise RuntimeError(
                    "multihost batch key sets differ across processes "
                    f"(fingerprints {g[:, 0].tolist()}); every process must "
                    "run the identical config")
            rows = -(-int(g[:, 1].max()) // n_local) * n_local
            t_c = ((int(g[:, 2].max()) // self.hop_size) * self.hop_size
                   if shared else 0)
            pad_dims = {k: int(g[:, 3 + i].max())
                        for i, k in enumerate(pad_only)}
            cached = (rows, t_c, pad_dims)
            if static_shapes:
                self._mh_dims_cache[sig] = cached
        rows, t_c, pad_dims = cached

        out = {}
        for k, a in arrs.items():
            a = np.asarray(a)
            widths = [(0, 0)] * a.ndim
            if k in shared_time_keys:
                if a.shape[-1] > t_c:
                    a = a[..., :t_c]
                elif a.shape[-1] < t_c:
                    widths[-1] = (0, t_c - a.shape[-1])
            elif k in pad_dims and a.shape[-1] < pad_dims[k]:
                widths[-1] = (0, pad_dims[k] - a.shape[-1])
            if a.shape[0] < rows:
                widths[0] = (0, rows - a.shape[0])
            if any(wd != (0, 0) for wd in widths):
                a = np.pad(a, widths)
            out[k] = a
        return out

    # -- epochs ------------------------------------------------------------------

    def train_epoch(self, dataloader) -> tp.Dict[str, tp.Any]:
        self.loss.initialize()
        max_items = len(dataloader)
        pad = int(math.log10(max(max_items, 1))) + 1
        summary: tp.Dict[str, tp.Any] = {"scalars": {}, "hists": {}}
        t0 = time.perf_counter()

        last_grads = None
        for idx, batch in enumerate(dataloader, start=1):
            dev_batch, real_b = self._device_batch(
                batch, ("clean", "noisy"),
                static_shapes=self._mh_static_train)
            self.state, metrics = self.train_step(self.state, dev_batch,
                                                  self._lrs())
            last_grads = metrics.pop("grads", None)
            # device scalars stay on-chip: Losses accumulates them lazily,
            # so the loop queues the next step without a host round-trip
            # (the print below is the only sync point)
            per_loss = {k.split("/", 1)[1]: v
                        for k, v in metrics.items() if k.startswith("loss/")
                        and k != "loss/total"}
            self.loss.accumulate(per_loss, real_b)
            if verbose() and idx % self.print_interval == 0:
                dt = time.perf_counter() - t0
                print(f"\rEpoch {self.epoch} - Train "
                      f"{idx:{pad}d}/{max_items} ({idx / max_items * 100:>4.1f}%)"
                      f"{self.loss.print()}"
                      f"  [{int(dt)}/{int(dt / idx * max_items)} sec]",
                      end="", flush=True)
            if self.profiler is not None:
                self.profiler.step()
            self.scheduler.warmup_step()
            if self.test and idx >= 10:
                break
        if self.profiler is not None:
            self.profiler.close()
        if verbose():
            clear_current_line()
        if not self.scheduler.requires_metric:
            self.scheduler.step()
        # else: ReduceLROnPlateau steps at the end of valid_epoch with the
        # total valid loss (the reference calls step() metric-less at
        # wrappers/ns.py:182, which its torch scheduler silently ignores;
        # here the plateau scheduler is actually driven)
        summary["scalars"] = self.loss.reduce()
        if self.plot_param_and_grad:
            from ..utils.summarize import plot_param_and_grad

            plot_param_and_grad(summary["hists"],
                                self.state["variables"]["params"],
                                grads=last_grads)
        return summary

    def valid_epoch(self, dataloader, calculate_metrics: bool = False
                    ) -> tp.Dict[str, tp.Any]:
        self.loss.initialize()
        if calculate_metrics and self.metrics is not None:
            self.metrics.initialize()
        for idx, batch in enumerate(dataloader, start=1):
            dev_batch, real_b = self._device_batch(batch, ("clean", "noisy"))
            out = self.valid_step(self.state["variables"], dev_batch)
            # no print in the valid loop -> fully async pipeline; the one
            # sync is loss.reduce() after the last batch
            per_loss = {k.split("/", 1)[1]: v
                        for k, v in out.items() if k != "loss/total"}
            self.loss.accumulate(per_loss, real_b)
            if self.test and idx >= 10:
                break
        summary = {"scalars": self._merge_across_hosts(self.loss.reduce())}
        if (self.train_mode and self.scheduler is not None
                and self.scheduler.requires_metric):
            total = sum(self.loss.weights[k.split("/", 1)[1]] * v
                        for k, v in summary["scalars"].items()
                        if k.split("/", 1)[1] in self.loss.weights)
            self.scheduler.step(total)
        if calculate_metrics and self.metrics is not None and self.pesq_loader:
            self.calculate_metrics(self.pesq_loader)
            summary["scalars"].update(self._merge_across_hosts(
                self.metrics.retrieve(self.epoch)))
        return summary

    @staticmethod
    def _merge_across_hosts(scalars: tp.Dict[str, float]
                            ) -> tp.Dict[str, float]:
        """Multihost: each process evaluates a disjoint data stride; average
        the scalar metrics across processes (reference: dist.reduce(SUM) to
        rank 0, losses.py:215-232). Single host: no-op."""
        import jax

        if jax.process_count() == 1 or not scalars:
            return scalars
        from jax.experimental import multihost_utils

        keys = sorted(scalars)
        vals = np.asarray([float(scalars[k]) for k in keys], np.float32)
        gathered = np.asarray(multihost_utils.process_allgather(vals))
        return dict(zip(keys, gathered.mean(axis=0).tolist()))

    def calculate_metrics(self, dataloader) -> None:
        """Enhance the eval set and submit PESQ/STOI jobs
        (reference: wrappers/ns.py:223-244)."""
        from ..parallel import local_rows

        for idx, batch in enumerate(dataloader, start=1):
            dev_batch, real_b = self._device_batch(batch, ("clean", "noisy"))
            # multihost: fetch only this process's row block; each process
            # submits its own items and retrieve() host-merges the means
            wav_hat = local_rows(
                self.infer_fn(self.state["variables"], dev_batch["noisy"]))
            clean = local_rows(dev_batch["clean"])
            wav_len = batch.get("wav_len")
            if wav_len is not None:
                wav_len = np.minimum(np.asarray(wav_len),
                                     wav_hat.shape[-1])
            self.metrics.submit(clean[:real_b], wav_hat[:real_b],
                                wav_len[:real_b] if wav_len is not None else None)
            if self.test and idx >= 2:
                break

    def infer_epoch(self, dataloader) -> tp.Dict[str, tp.Any]:
        """Enhance the showcase files -> audio + spectrogram summaries
        (reference: wrappers/ns.py:246-286)."""
        summary: tp.Dict[str, tp.Any] = {"audios": {}, "specs": {},
                                         "scalars": {}}
        cfg = STFTConfig(n_fft=1024, hop_size=256, win_size=1024)
        sisdrs = []
        variables = self.state["variables"]
        if jax.process_count() > 1:
            # showcase inference is rank-0-local compute; globally-sharded
            # variables cannot mix with host-local inputs under plain jit
            variables = jax.tree.map(np.asarray, variables)
        for i, batch in enumerate(dataloader):
            noisy = batch["noisy"]
            clean = batch["clean"]
            t = (noisy.shape[-1] // self.hop_size) * self.hop_size
            wav_hat = np.asarray(self.infer_fn(
                variables, jnp.asarray(noisy[..., :t])))
            # the loader bucket-pads file lengths (bounded compile set);
            # trim the padding tail back off the showcase outputs
            wl = batch.get("wav_len")
            if wl is not None:
                n = min(int(wl[0]), t)
                noisy, clean, wav_hat = (noisy[..., :n], clean[..., :n],
                                         wav_hat[..., :n])
                t = (n // self.hop_size) * self.hop_size
            name = batch.get("filename", [f"{i:02d}"])[0]
            if self.epoch <= getattr(self.hps.infer, "interval", 20):
                summary["audios"][f"noisy/{name}"] = noisy[0]
                summary["audios"][f"clean/{name}"] = clean[0]
            summary["audios"][f"enhanced/{name}"] = wav_hat[0]
            spec = np.asarray(_stft_fn(jnp.asarray(wav_hat[:1]), cfg))
            mag = np.sqrt((spec ** 2).sum(-1))[0]
            summary["specs"][f"enhanced/{name}"] = np.log10(mag + 1e-5)
            from ..functional import spec_to_mel

            summary["specs"][f"enhanced_mel/{name}"] = spec_to_mel(
                mag, sr=self.sr)
            sisdrs.append(sisdr(wav_hat[0, :t], clean[0, :t]))
        summary["scalars"]["infer/sisdr"] = float(np.mean(sisdrs))
        return summary

    # -- checkpointing -------------------------------------------------------------

    def save(self, epoch: int) -> str:
        return save_checkpoint(
            self.base_dir, epoch, self.state,
            scheduler_state=self.scheduler.state_dict() if self.scheduler else None,
            metrics=self.metrics.state_dict() if self.metrics else None)

    def load(self, epoch: tp.Optional[int] = None) -> bool:
        """Resume from {base_dir}/{epoch:05d}.ckpt or the latest one."""
        if epoch is not None:
            import os

            path = f"{self.base_dir}/{epoch:05d}.ckpt"
            if not os.path.exists(path):
                raise FileNotFoundError(path)
        else:
            path = latest_checkpoint(self.base_dir)
            if path is None:
                return False
        ckpt = load_checkpoint(path)
        as_arr = lambda x: None if x is None else jnp.asarray(x)  # noqa: E731
        variables = jax.tree.map(as_arr, ckpt["variables"],
                                 is_leaf=lambda x: x is None)
        self.state["variables"] = replicate(variables, self.mesh)
        if self.train_mode and ckpt.get("opt_state") is not None:
            opt_state = jax.tree.map(as_arr, ckpt["opt_state"],
                                     is_leaf=lambda x: x is None)
            self.state["opt_state"] = replicate(opt_state, self.mesh)
        if self.scheduler is not None and ckpt.get("scheduler") is not None:
            self.scheduler.load_state_dict(ckpt["scheduler"])
        if self.metrics is not None:
            self.metrics.load_state_dict(ckpt.get("metrics"))
        self.epoch = ckpt["epoch"]
        if verbose():
            print(f"loaded checkpoint {path} (epoch {self.epoch})")
        return True
