"""Streaming serving demo: many wavs through one dynamic-batched engine.

Where scripts/enhance.py batches whole utterances through the offline graph,
this drives the real serving shape (fastenhancer_tpu/serving.StreamingEngine):
a fixed-capacity slot pool ticking hop-by-hop, with streams joining staggered
in time and leaving as they finish — the way concurrent live audio sessions
actually arrive. Replaces the reference's one-ONNX-session-per-stream runner
(reference: scripts/test_onnx.py:34-51) with one compiled step for all
streams.

    python -m scripts.serve -n NAME -i IN_DIR -o OUT_DIR \
        [--capacity 8] [--stagger 25] [--fused] [--dtype bf16]

Prints per-tick wall latency percentiles and the aggregate RTF.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastenhancer_tpu.utils.platform import honor_jax_platforms

honor_jax_platforms()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--name", required=True)
    ap.add_argument("--base_dir", default="logs")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("-i", "--input-dir", required=True)
    ap.add_argument("-o", "--output-dir", required=True)
    ap.add_argument("--capacity", type=int, default=8,
                    help="slot count = compiled batch size")
    ap.add_argument("--stagger", type=int, default=25,
                    help="ticks between stream admissions (25 = 400 ms at "
                         "16 kHz/hop 256)")
    ap.add_argument("--fused", action="store_true",
                    help="fold weights and use the fused Pallas stack step")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16", "bf16"])
    args = ap.parse_args()
    if args.stagger < 1:
        ap.error("--stagger must be >= 1 (ticks between admissions)")

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fastenhancer_tpu.utils.hparams import get_hparams
    from fastenhancer_tpu.wrappers import get_wrapper
    from fastenhancer_tpu.data import read_wav, write_wav
    from fastenhancer_tpu.serving import StreamingEngine

    hps = get_hparams(None, base_dir=os.path.join(args.base_dir, args.name))
    wrapper = get_wrapper(hps.wrapper)(hps, train=False)
    if not wrapper.load(args.epoch):
        raise FileNotFoundError(f"no checkpoint in {hps.base_dir}")
    os.makedirs(args.output_dir, exist_ok=True)

    model = wrapper.model
    variables = wrapper.state["variables"]
    if args.fused:
        variables = model.fold(variables)
    dtype = jnp.bfloat16 if args.dtype in ("bf16", "bfloat16") else jnp.float32
    if dtype != jnp.float32:
        # the engine's contract: variables cast to the carry/activation
        # dtype (it refuses a mismatched pair at construction)
        variables = jax.tree.map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, variables, is_leaf=lambda a: a is None)
    engine = StreamingEngine(model, variables, capacity=args.capacity,
                             dtype=dtype, fused=args.fused)
    sr = hps.data.sampling_rate
    hop = engine.hop

    files = sorted(f for f in os.listdir(args.input_dir)
                   if f.endswith(".wav"))
    if not files:
        raise FileNotFoundError(f"no .wav files in {args.input_dir}")
    pending = list(files)
    # per-stream session state: handle -> (filename, wav, cursor, outputs)
    sessions = {}
    tick_wall = []
    total_samples = 0
    tick_idx = 0
    t_start = time.perf_counter()
    while pending or sessions:
        # admit a new stream every `stagger` ticks while slots are free
        if pending and engine.active < args.capacity \
                and tick_idx % args.stagger == 0:
            f = pending.pop(0)
            wav, _ = read_wav(os.path.join(args.input_dir, f), sr=sr)
            wav = wav.astype(np.float32)
            h = engine.open_stream()
            # drain ticks: extra silence hops that flush the n_fft-hop delay
            drain = -(-engine.delay_samples // hop)
            n_ticks = -(-len(wav) // hop) + drain
            sessions[h] = [f, np.pad(wav, (0, n_ticks * hop - len(wav))),
                           0, [], len(wav)]
        if not sessions:
            tick_idx += 1
            continue
        hops = {}
        for h, (f, wav, cur, outs, _) in sessions.items():
            hops[h] = wav[cur * hop:(cur + 1) * hop]
        t0 = time.perf_counter()
        outs = engine.tick(hops)
        tick_wall.append(time.perf_counter() - t0)
        done = []
        for h, out in outs.items():
            sess = sessions[h]
            sess[2] += 1
            sess[3].append(out)
            if sess[2] * hop >= len(sess[1]):
                done.append(h)
        for h in done:
            f, wav, _, outs_list, n = sessions.pop(h)
            engine.close_stream(h)
            full = np.concatenate(outs_list)[engine.delay_samples:]
            write_wav(os.path.join(args.output_dir, f), full[:n], sr)
            total_samples += n
            print(f"\rdone {len(files) - len(pending) - len(sessions)}"
                  f"/{len(files)}", end="", flush=True)
        tick_idx += 1
    wall = time.perf_counter() - t_start
    ticks = np.sort(np.array(tick_wall[1:]) * 1e3)  # skip compile tick
    audio_sec = total_samples / sr
    print(f"\nserved {len(files)} streams ({audio_sec:.1f}s audio) "
          f"in {wall:.2f}s — aggregate RTF {wall / max(audio_sec, 1e-9):.5f}")
    if len(ticks):
        print(f"tick latency ms: p50 {ticks[len(ticks) // 2]:.2f} "
              f"p90 {ticks[int(len(ticks) * .9)]:.2f} "
              f"p99 {ticks[min(int(len(ticks) * .99), len(ticks) - 1)]:.2f} "
              f"(hop period {hop / sr * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
