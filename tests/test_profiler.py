"""Step-window trace capture (utils/profiler.py).

The reference has no profiler integration (only wall timers, reference:
wrappers/ns_shard.py:106-114); this subsystem is TPU-native tooling, so the
tests pin down its contract: one trace window per run, opened/closed at the
configured step edges, files actually written where TensorBoard looks.
"""
import glob
import os

import jax
import jax.numpy as jnp

from fastenhancer_tpu.utils.hparams import HParams
from fastenhancer_tpu.utils.profiler import StepProfiler, make_profiler


def test_window_capture_writes_trace(tmp_path):
    logdir = str(tmp_path / "profile")
    prof = StepProfiler(logdir, start=2, steps=2)

    @jax.jit
    def f(x):
        return (x * 2.0 + 1.0).sum()

    x = jnp.ones((8, 8))
    for _ in range(6):
        float(f(x))
        prof.step()
    assert prof.done
    # jax writes plugins/profile/<run>/*.trace.json.gz under the logdir
    traces = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                       recursive=True)
    assert traces, f"no trace files under {logdir}"


def test_epoch_end_inside_window_closes_once(tmp_path):
    logdir = str(tmp_path / "profile")
    prof = StepProfiler(logdir, start=0, steps=100)
    prof.step()
    prof.close()  # epoch ended mid-window
    assert prof.done
    prof.step()  # further steps are no-ops, no second trace is opened
    prof.close()
    assert glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                     recursive=True)


def test_make_profiler_parses_config(tmp_path):
    base = str(tmp_path)
    assert make_profiler(HParams(), base) is None
    assert make_profiler(HParams(profile=False), base) is None

    prof = make_profiler(HParams(profile=True), base)
    assert prof is not None and (prof.start, prof.stop) == (10, 15)
    assert prof.logdir == os.path.join(base, "profile")

    prof = make_profiler(HParams(profile={"start": 3, "steps": 2}), base)
    assert (prof.start, prof.stop) == (3, 5)
