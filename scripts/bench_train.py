"""Train-step throughput benchmark.

Times the jitted train step (forward + backward + AdamP update, bf16
compute over f32 masters) for any recipe on whatever jax.devices() offers
— the reference has no training-throughput harness (its analog is the
per-phase timers in wrappers/ns_shard.py:106-114); this makes the number
reproducible.

    python -m scripts.bench_train -c configs/fastenhancer/b.yaml \
        [--batch 64] [--seconds 2.0] [--steps 20]

Reports ms/step and the realtime multiple (batch * audio_seconds / wall).
Like bench.py, the step output is reduced to a scalar fetched to host each
call so the timing includes the full pipeline on the axon-tunneled chip.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastenhancer_tpu.utils.platform import honor_jax_platforms

honor_jax_platforms()

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", default="configs/fastenhancer/b.yaml")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--no-mixed", action="store_true",
                   help="force f32 compute (recipes default to mixed bf16)")
    p.add_argument("--remat", action="store_true",
                   help="train.remat=True (activation recompute; needed for "
                        "the L recipe at batch 64 on a 16 GB chip)")
    args = p.parse_args()

    from fastenhancer_tpu.utils.hparams import get_hparams
    from fastenhancer_tpu.wrappers import get_wrapper

    hps = get_hparams(args.config, base_dir=None, save=False)
    if args.no_mixed:
        hps.train.fp16 = False
        hps.train.bf16 = False
    if args.remat:
        hps.train.remat = True
    if "pesq" in hps:
        hps.pop("pesq")  # no metric executor for a pure-throughput run
    hps.base_dir = "/tmp/bench_train"
    wrapper = get_wrapper(hps.wrapper)(hps, train=True)

    sr = hps.data.sampling_rate
    t = int(args.seconds * sr) // wrapper.hop_size * wrapper.hop_size
    rng = np.random.default_rng(0)
    batch = {
        "clean": rng.standard_normal((args.batch, t), dtype=np.float32) * 0.1,
        "noisy": rng.standard_normal((args.batch, t), dtype=np.float32) * 0.1,
    }
    dev_batch, _ = wrapper._device_batch(batch, ("clean", "noisy"))
    lrs = wrapper._lrs()

    wrapper.state, metrics = wrapper.train_step(wrapper.state, dev_batch, lrs)
    float(metrics["loss/total"])  # sync: compile + first step
    t0 = time.perf_counter()
    for _ in range(args.steps):
        wrapper.state, metrics = wrapper.train_step(wrapper.state, dev_batch, lrs)
    float(metrics["loss/total"])  # scalar fetch = honest full-pipeline sync
    dt = (time.perf_counter() - t0) / args.steps

    audio_s = args.batch * t / sr
    print(f"config={args.config} batch={args.batch} len={t / sr:.1f}s "
          f"devices={jax.device_count()} "
          f"mixed={'off' if args.no_mixed else 'bf16'}")
    print(f"train step: {dt * 1e3:.1f} ms  ({audio_s / dt:,.0f}x realtime)")


if __name__ == "__main__":
    main()
