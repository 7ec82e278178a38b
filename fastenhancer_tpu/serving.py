"""Slot-based streaming serving engine: dynamic join/leave over one batch.

The reference serves one stream per ONNX session (scripts/test_onnx.py); the
TPU-native serving shape instead packs many concurrent streams into ONE
jitted per-hop step (docs/performance.md: ~28k real-time streams/chip at
256 slots). This module is the piece that makes that shape *operable*:
streams arrive and finish at different times, so the engine owns a
fixed-capacity slot pool over a single donated carry and lets callers
open/close streams between ticks without recompiling anything.

Design (TPU-first):
  * **Static shapes.** The batch axis is a fixed `capacity`; inactive slots
    process zeros. XLA compiles the step once; joins/leaves are O(1)
    bookkeeping plus one `dynamic_update_slice` carry reset.
  * **Donated carry.** The per-hop step donates the carry buffers, so the
    steady state allocates nothing per tick (same trick as
    scripts/export.py's latency path).
  * **Model-agnostic slot reset.** A fresh stream needs its slot's state
    (STFT/iSTFT caches, GRU hiddens, attention KV windows, conv frame
    caches) re-initialized. The engine infers, once, which axis of every
    carry leaf scales with the batch by comparing `init_streaming_carry(1)`
    against `init_streaming_carry(capacity)` leaf shapes, then resets slot
    `i` with one `lax.dynamic_update_slice` per leaf. Works for every model
    family in the zoo (tested) without per-model plumbing.
  * **Slot isolation is a tested property**: a stream's output through a
    busy engine equals its isolated single-stream run bit-for-bit modulo
    float tolerance, across interleaved opens/closes and slot reuse
    (tests/test_serving.py — default / dptransformer / time_kernel / bsrnn
    / fspen / lisennet, plus the fused Pallas step). The axis inference
    assumes batch-MAJOR flattening of merged axes (h rows packed
    [b0f0..b0fF, b1f0..]), which is how every model in the zoo packs its
    caches; the per-family isolation test is what proves it.

Typical use:

    engine = StreamingEngine(model, variables, capacity=256)
    h = engine.open_stream()
    for hop_samples in hops:                  # [hop] each
        out = engine.tick({h: hop_samples})   # {handle: [hop]}
    tail = engine.flush(h)                    # drain the n_fft-hop delay
    engine.close_stream(h)

`tick` accepts any subset of active handles; streams without input this
tick are fed silence (their carry still advances — real-time semantics).
Use `scripts/serve.py` for a CLI demonstration.
"""
from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = tp.Dict[str, tp.Any]


def _slot_axes(one_leaves: tp.List[Array], full_leaves: tp.List[Array],
               capacity: int) -> tp.List[tp.Optional[int]]:
    """For each carry leaf, the axis that scales linearly with the batch.

    Inferred by shape comparison between a 1-stream and a capacity-stream
    carry: the slot axis is the unique axis where full = capacity * one and
    every other axis matches (batch-major packing, which is how every model
    in the zoo flattens its caches). None = leaf does not depend on batch
    (shared constants), left untouched by resets.
    """
    axes: tp.List[tp.Optional[int]] = []
    for one, full in zip(one_leaves, full_leaves):
        if one.shape == full.shape:
            axes.append(None)
            continue
        if one.ndim != full.ndim:
            raise ValueError(
                f"carry leaf rank changed with batch: {one.shape} vs "
                f"{full.shape} — cannot infer the slot axis")
        cand = [a for a in range(one.ndim)
                if full.shape[a] == capacity * one.shape[a]
                and all(full.shape[b] == one.shape[b]
                        for b in range(one.ndim) if b != a)]
        if len(cand) != 1:
            raise ValueError(
                f"ambiguous slot axis for carry leaf {one.shape} -> "
                f"{full.shape} at capacity {capacity}: {cand}")
        axes.append(cand[0])
    return axes


class StreamingEngine:
    """Fixed-capacity dynamic-batching engine over one model's streaming step.

    Args:
      model: any model exposing `init_streaming_carry(batch, dtype)` and
        `streaming_step(variables, carry, hops)` (the whole zoo does); for
        `fused=True` it must also expose `build_stack_plan` /
        `streaming_step_fused` / `init_streaming_carry(..., fused=True)`
        (fastenhancer default/conv_stft/time_kernel/dprnn/dptransformer/ln
        and bsrnn, folded variables; the dprnn and bsrnn kernels
        additionally need a sublane-aligned capacity — 8 for f32, 16 for
        bf16, `supports_batch` in ops/{dprnn,bsrnn}_stack.py — enforced
        with a clear error at construction via the models'
        validate_fused_batch hook).
      variables: parameter pytree (fold()ed when fused=True).
      capacity: slot count == compiled batch size. Must be >= 2 (the slot
        axis of each carry leaf is inferred from how shapes scale with it).
      dtype: carry/activation dtype (bf16 for serving, f32 default).
      devices: shard the slots over the first N local devices (1-D dp mesh,
        capacity % N == 0). Ticks are batch-parallel — zero collectives —
        and the fused step runs per shard under shard_map; multi-device ≡
        single-device is a tested property (virtual 8-device mesh).
    """

    def __init__(self, model, variables: Params, capacity: int,
                 dtype=jnp.float32, fused: bool = False,
                 devices: tp.Optional[int] = None):
        if capacity < 2:
            raise ValueError("capacity must be >= 2")
        self.model = model
        self.capacity = capacity
        self.dtype = dtype
        self.hop = model.stft_cfg.hop_size
        self.delay_samples = model.stft_cfg.n_fft - self.hop
        self._variables = variables
        # The engine's contract: variables are cast to `dtype` (the
        # carry/activation dtype). A mismatched pair fails later with an
        # opaque error (conv dtype mismatch unfused, a Pallas ref-swap
        # dtype error fused) — surface it clearly at construction instead.
        flt = [l for l in jax.tree.leaves(variables)
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                         jnp.floating)]
        if flt and any(l.dtype != jnp.dtype(dtype) for l in flt):
            bad = next(l.dtype for l in flt if l.dtype != jnp.dtype(dtype))
            raise ValueError(
                f"StreamingEngine(dtype={jnp.dtype(dtype).name}) requires "
                f"the variables cast to that dtype (found {bad} leaves) — "
                "cast the float leaves of the pytree first, e.g. "
                "jax.tree.map(lambda a: a.astype(dtype) if "
                "jnp.issubdtype(a.dtype, jnp.floating) else a, variables)")
        if fused and hasattr(model, "validate_fused_batch"):
            # fail at construction with a clear message (e.g. dprnn's /
            # bsrnn's sublane-aligned-capacity requirement) instead of deep
            # inside the kernel's tile selection on the first tick. With
            # devices>1 the fused step runs PER SHARD at capacity//devices
            # (shard_map), so that is the batch the kernel must tile —
            # capacity % devices is re-checked with its own error below.
            # dtype IS the activation dtype here (contract enforced above).
            shard = capacity // devices if devices and devices > 1 \
                and capacity % devices == 0 else capacity
            model.validate_fused_batch(shard, dtype)
        if fused:
            # the fused step takes/returns its own carry layout (stacked
            # block carries for the GRU family, rotating-slot K/V caches +
            # shared pointer for dptransformer, stacked f-major (h, c) for
            # bsrnn) — ask the model for it BEFORE inferring treedef/slot
            # axes so the carry structure is stable across ticks (shard_map
            # out_specs and _reset_impl both depend on it). Leaves whose
            # shape does not scale with capacity (e.g. dpt's slot pointer)
            # get slot axis None and are left untouched by per-slot resets
            # — sound because a zeroed K/V slot is correct at ANY pointer.
            self._carry = model.init_streaming_carry(capacity, dtype,
                                                     fused=True)
            one = model.init_streaming_carry(1, dtype, fused=True)
        else:
            self._carry = model.init_streaming_carry(capacity, dtype)
            one = model.init_streaming_carry(1, dtype)
        full_leaves, treedef = jax.tree.flatten(self._carry)
        one_leaves = treedef.flatten_up_to(one)
        self._axes = _slot_axes(one_leaves, full_leaves, capacity)
        self._one_leaves = one_leaves
        self._treedef = treedef

        if fused:
            plan = model.build_stack_plan(variables, dtype=dtype)
            step = functools.partial(model.streaming_step_fused, variables,
                                     plan)
        else:
            step = functools.partial(model.streaming_step, variables)
        # the step's output carry structure must equal its input's —
        # everything downstream (donation, shard_map specs, slot reset)
        # assumes a stable carry pytree
        out_struct = jax.eval_shape(
            step, self._carry,
            jax.ShapeDtypeStruct((capacity, self.hop), dtype))[0]
        if jax.tree.structure(out_struct) != treedef:
            raise ValueError(
                "streaming step changes its carry pytree structure; "
                "StreamingEngine requires a structure-stable carry")

        self._mesh = None
        self._in_sharding = None
        if devices is not None and devices > 1:
            # multi-chip serving: slots sharded over a 1-D dp mesh. The
            # inferred slot axis of each carry leaf IS its shardable axis;
            # ticks are batch-parallel (zero collectives) and shard_map
            # keeps the fused Pallas kernel usable (parallel/__init__.py).
            from jax.experimental.shard_map import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel import BATCH_AXIS, make_mesh

            if devices > len(jax.devices()):
                raise ValueError(
                    f"devices={devices} but only {len(jax.devices())} "
                    f"devices are available")
            if capacity % devices:
                raise ValueError(f"capacity {capacity} must divide evenly "
                                 f"over {devices} devices")
            self._mesh = make_mesh(devices)
            carry_specs = jax.tree.unflatten(self._treedef, [
                P() if a is None
                else P(*[BATCH_AXIS if i == a else None
                         for i in range(leaf.ndim)])
                for leaf, a in zip(full_leaves, self._axes)])
            self._carry = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(self._mesh, s)),
                self._carry, carry_specs)
            self._in_sharding = NamedSharding(self._mesh, P(BATCH_AXIS))
            step = shard_map(step, mesh=self._mesh,
                             in_specs=(carry_specs, P(BATCH_AXIS)),
                             out_specs=(carry_specs, P(BATCH_AXIS)),
                             check_rep=False)
        # donate the carry: steady-state ticks update state in place
        self._step = jax.jit(step, donate_argnums=(0,))
        self._reset = jax.jit(self._reset_impl, donate_argnums=(0,))

        self._slot_of: tp.Dict[int, int] = {}        # handle -> slot
        self._free = list(range(capacity - 1, -1, -1))
        self._next_handle = 0

    # -- slot lifecycle ------------------------------------------------------

    def _reset_impl(self, carry, slot: Array):
        """Re-initialize one slot's state in every carry leaf.

        Single-device: `dynamic_update_slice` writes just that slot's rows.
        Sharded: a masked blend on the unfolded slot axis — elementwise on
        the sharded axis, so no resharding (the unfold keeps the shard
        boundary on the capacity axis); joins are rare, the full-carry
        select is acceptable there.
        """
        leaves = self._treedef.flatten_up_to(carry)
        out = []
        for leaf, fresh, axis in zip(leaves, self._one_leaves, self._axes):
            if axis is None:
                out.append(leaf)
                continue
            per = fresh.shape[axis]
            if self._mesh is None:
                start = [jnp.int32(0)] * leaf.ndim
                start[axis] = slot * per
                out.append(jax.lax.dynamic_update_slice(leaf, fresh, start))
                continue
            unfolded = leaf.reshape(leaf.shape[:axis] + (self.capacity, per)
                                    + leaf.shape[axis + 1:])
            sel_shape = [1] * unfolded.ndim
            sel_shape[axis] = self.capacity
            sel = (jnp.arange(self.capacity) == slot).reshape(sel_shape)
            fresh_b = jnp.expand_dims(fresh, axis)  # [..., 1, per, ...]
            out.append(jnp.where(sel, fresh_b, unfolded).reshape(leaf.shape))
        return jax.tree.unflatten(self._treedef, out)

    def open_stream(self) -> int:
        """Claim a slot with fresh state; returns a handle for tick()."""
        if not self._free:
            raise RuntimeError(f"engine full ({self.capacity} streams)")
        slot = self._free.pop()
        handle = self._next_handle
        self._next_handle += 1
        self._slot_of[handle] = slot
        self._carry = self._reset(self._carry, jnp.int32(slot))
        return handle

    def close_stream(self, handle: int) -> None:
        slot = self._slot_of.pop(handle)   # KeyError on unknown handle
        self._free.append(slot)

    @property
    def active(self) -> int:
        return len(self._slot_of)

    # -- data path -----------------------------------------------------------

    def tick(self, hops: tp.Dict[int, np.ndarray]) -> tp.Dict[int, np.ndarray]:
        """Advance every stream by one hop.

        hops: {handle: [hop] samples} for any subset of active handles —
        absent handles are fed silence (their clock still advances).
        Returns {handle: [hop] enhanced samples} for the handles given,
        delayed by `delay_samples` (the reference streaming contract,
        docs/docs/onnx.md).
        """
        buf = np.zeros((self.capacity, self.hop), np.float32)
        for handle, wav in hops.items():
            slot = self._slot_of[handle]   # KeyError on unknown handle
            wav = np.asarray(wav, np.float32)
            if wav.shape != (self.hop,):
                raise ValueError(
                    f"hop for handle {handle} has shape {wav.shape}, "
                    f"expected ({self.hop},)")
            buf[slot] = wav
        dev_buf = jnp.asarray(buf, self.dtype)
        if self._in_sharding is not None:
            dev_buf = jax.device_put(dev_buf, self._in_sharding)
        self._carry, out = self._step(self._carry, dev_buf)
        out = np.asarray(out, np.float32)
        return {h: out[self._slot_of[h]] for h in hops}

    def flush(self, handle: int) -> np.ndarray:
        """Feed silence until the algorithmic delay is drained; returns the
        remaining `delay_samples` of output for this stream."""
        n_ticks = -(-self.delay_samples // self.hop)
        if n_ticks == 0:  # n_fft == hop: zero algorithmic delay
            return np.zeros(0, np.float32)
        outs = [self.tick({handle: np.zeros(self.hop, np.float32)})[handle]
                for _ in range(n_ticks)]
        return np.concatenate(outs)[:self.delay_samples]

    def run_stream(self, handle: int, wav: np.ndarray) -> np.ndarray:
        """Convenience: stream a whole utterance through one handle (other
        active streams receive silence during these ticks) and return the
        delay-compensated enhancement, same length as `wav` (a trailing
        partial hop is zero-padded on input and trimmed on output)."""
        wav = np.asarray(wav, np.float32)
        n = len(wav)
        padded = np.pad(wav, (0, -n % self.hop))
        outs = [self.tick({handle: padded[i:i + self.hop]})[handle]
                for i in range(0, len(padded), self.hop)]
        outs.append(self.flush(handle))
        return np.concatenate(outs)[self.delay_samples:
                                    self.delay_samples + n]


__all__ = ["StreamingEngine"]
