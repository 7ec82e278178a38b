"""Step-window XLA trace capture.

The reference's only tracing is hand-rolled wall timers (reference:
wrappers/ns_shard.py:44-58,106-114 and the SHARD_DEBUG=1 cut tracer,
utils/data/shard_on_the_fly.py:176-217). Those per-phase timers exist here
too (wrappers/ns_shard.py); this module adds what a TPU workflow actually
uses for kernel-level attribution: a `jax.profiler` trace of a small step
window, viewable in TensorBoard (or Perfetto via the generated
`.trace.json.gz`).

Enable per run with a config/CLI override:

    python train.py -n run -c configs/... -p train.profile=True
    python train.py ... -p 'train.profile={"start": 20, "steps": 5}'

The trace lands in `logs/{name}/profile/` next to the TensorBoard event
files. Capturing a *window* (default: steps 10..15 of the first epoch after
enabling) skips compile time and warmup, and stops automatically so long
runs pay zero overhead afterwards.
"""
from __future__ import annotations

import os
import typing as tp

import jax

__all__ = ["StepProfiler", "make_profiler"]


class StepProfiler:
    """Capture one `jax.profiler` trace of steps [start, start+steps).

    Call `step()` once per training step *after* the step's host-side
    dispatch; the window is opened before dispatch of step `start` and
    closed after step `start+steps-1` completes (sync handled by the
    caller's scalar fetches, which every train step here performs).
    """

    def __init__(self, logdir: str, start: int = 10, steps: int = 5):
        self.logdir = logdir
        self.start = int(start)
        self.stop = int(start) + int(steps)
        self._idx = 0
        self._active = False
        self.done = False

    def step(self) -> None:
        """Advance the step counter; open/close the trace at the window edges."""
        if self.done:
            return
        if self._idx == self.start and not self._active:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True
        self._idx += 1
        if self._active and self._idx >= self.stop:
            self.close()

    def close(self) -> None:
        """Stop an in-flight trace (epoch may end inside the window); one
        window per run either way."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self.done = True
        if self._idx >= self.stop:
            self.done = True


def make_profiler(hp_train, base_dir: str) -> tp.Optional[StepProfiler]:
    """Build a StepProfiler from `train.profile` (False | True | {start, steps})."""
    spec = getattr(hp_train, "profile", False)
    if not spec:
        return None
    kwargs: tp.Dict[str, int] = {}
    if hasattr(spec, "to_dict"):
        kwargs = spec.to_dict()
    elif isinstance(spec, dict):
        kwargs = dict(spec)
    logdir = kwargs.pop("logdir", os.path.join(base_dir, "profile"))
    return StepProfiler(logdir, **kwargs)
