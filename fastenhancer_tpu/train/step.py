"""The jitted train / valid step — the hot loop of the framework.

TPU-first redesign of the reference's per-batch step (reference:
wrappers/ns.py:131-186): one pure function {state, batch, lrs} -> {state,
metrics}, jitted once over a data-parallel mesh with the state donated. Under
the sharded-batch mesh:

  * gradient averaging == XLA-inserted psum (≡ DDP allreduce),
  * train-mode BatchNorm means are global-batch means (≡ SyncBatchNorm),
  * the fp16 GradScaler machinery is dropped: TPU trains in bf16 compute with
    f32 master params/moments — a documented deviation; there is no inf/nan
    scaler state (bf16 has f32's exponent range).

State layout (mirrors the reference checkpoint contract, wrappers/ns.py:
323-336, minus the scaler): {"variables": {params, stats}, "opt_state":
{m, v, step}}.
"""
from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp

from ..losses import Losses
from ..optim import GroupedOptimizer
from .grad_clip import make_clipper

Array = jax.Array
Params = tp.Dict[str, tp.Any]


def cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def make_train_step(
    model,
    losses: Losses,
    optimizer: GroupedOptimizer,
    clip_grad: tp.Optional[str] = None,
    clip_grad_kwargs: tp.Optional[tp.Mapping[str, tp.Any]] = None,
    compute_dtype: tp.Optional[tp.Any] = None,
    donate: bool = True,
    return_grads: bool = False,
    skip_nonfinite: bool = False,
):
    """Build the jitted train step.

    compute_dtype=jnp.bfloat16 casts params + wavs for the forward/backward
    (mixed precision); master params, moments and BN stats stay f32.

    skip_nonfinite keeps the old state whenever any grad is NaN/Inf — the
    branch-free analog of the reference's GradScaler inf-skip (reference:
    wrappers/ns.py:158-164). bf16 rarely needs it (f32 exponent range, no
    loss scaling), so it is opt-in via `train.skip_nonfinite_grads`.
    """
    clipper = make_clipper(clip_grad, clip_grad_kwargs)

    def loss_fn(params: Params, stats: Params, clean: Array, noisy: Array,
                row_mask: tp.Optional[Array]):
        if compute_dtype is not None:
            fwd_params = cast_tree(params, compute_dtype)
            noisy_c = noisy.astype(compute_dtype)
            clean_c = clean.astype(compute_dtype)
        else:
            fwd_params, noisy_c, clean_c = params, noisy, clean
        wav_hat, spec_hat, new_stats = model.forward(
            {"params": fwd_params, "stats": stats}, noisy_c, train=True,
            row_mask=row_mask)
        spec_clean = model.stft(clean_c)
        # losses in f32 regardless of compute dtype (reference keeps loss
        # sums in f32 and forces PESQ to f32, losses.py:160-161)
        total, per_loss = losses.calculate(
            wav_hat.astype(jnp.float32), spec_hat.astype(jnp.float32),
            clean.astype(jnp.float32), spec_clean.astype(jnp.float32),
            row_mask=row_mask)
        new_stats = cast_tree(new_stats, jnp.float32)
        return total, (per_loss, new_stats)

    def train_step(state: Params, batch: Params, lrs: Array):
        variables = state["variables"]
        clean, noisy = batch["clean"], batch["noisy"]
        # rows zero-padded for even device sharding are excluded from the
        # losses and the train-mode BN statistics (the reference never pads
        # batch rows; one zero row in a batch of 4 would otherwise move
        # si_snr from -20 dB to +2.5)
        row_mask = batch.get("row_mask")
        # truncate to a hop multiple (reference: wrappers/ns.py:147-149)
        hop = model.hop_size
        t = (clean.shape[-1] // hop) * hop
        clean, noisy = clean[..., :t], noisy[..., :t]

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (per_loss, new_stats)), grads = grad_fn(
            variables["params"], variables["stats"], clean, noisy, row_mask)
        grads = cast_tree(grads, jnp.float32)
        grads, gnorm = clipper(grads)
        params, opt_state = optimizer.update(
            variables["params"], grads, state["opt_state"], lrs)
        metrics = {"loss/total": total, "grad_norm": gnorm,
                   **{f"loss/{k}": v for k, v in per_loss.items()}}
        if skip_nonfinite:
            finite = jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
            keep = lambda new, old: jax.tree.map(  # noqa: E731
                lambda n, o: jnp.where(finite, n, o), new, old)
            params = keep(params, variables["params"])
            opt_state = keep(opt_state, state["opt_state"])
            new_stats = keep(new_stats, variables["stats"])
            metrics["skipped"] = 1.0 - finite.astype(jnp.float32)
        new_state = {
            "variables": {"params": params, "stats": new_stats},
            "opt_state": opt_state,
        }
        if return_grads:  # for train.plot_param_and_grad histograms
            metrics["grads"] = grads
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_valid_step(model, losses: Losses, compute_dtype=None):
    """Forward + losses only, eval-mode BN (running stats)."""

    def valid_step(variables: Params, batch: Params):
        clean, noisy = batch["clean"], batch["noisy"]
        row_mask = batch.get("row_mask")  # eval BN uses running stats; only
        hop = model.hop_size              # the loss means need masking
        t = (clean.shape[-1] // hop) * hop
        clean, noisy = clean[..., :t], noisy[..., :t]
        params = variables["params"]
        if compute_dtype is not None:
            params = cast_tree(params, compute_dtype)
            noisy = noisy.astype(compute_dtype)
        wav_hat, spec_hat, _ = model.forward(
            {"params": params, "stats": variables["stats"]}, noisy, train=False)
        spec_clean = model.stft(clean)
        total, per_loss = losses.calculate(
            wav_hat.astype(jnp.float32), spec_hat.astype(jnp.float32),
            clean.astype(jnp.float32), spec_clean.astype(jnp.float32),
            row_mask=row_mask)
        return {"loss/total": total,
                **{f"loss/{k}": v for k, v in per_loss.items()}}

    return jax.jit(valid_step)


def make_infer_fn(model, compute_dtype=None):
    """wav -> enhanced wav (offline graph), jitted per input shape."""

    @functools.partial(jax.jit, static_argnums=())
    def infer(variables: Params, noisy: Array) -> Array:
        params = variables["params"]
        if compute_dtype is not None:
            params = cast_tree(params, compute_dtype)
            noisy = noisy.astype(compute_dtype)
        wav_hat, _, _ = model.forward(
            {"params": params, "stats": variables["stats"]}, noisy, train=False)
        return wav_hat.astype(jnp.float32)

    return infer
