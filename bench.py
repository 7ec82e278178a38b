"""North-star benchmark: FastEnhancer_B batched streaming inference.

Packs N concurrent 16 kHz streams and runs the frame-by-frame streaming
graph (one jax.lax.scan whose carry replaces the reference's ONNX caches)
on one chip. Reports the per-stream real-time factor:

    RTF_per_stream = wall_time / (audio_duration * n_streams)

i.e. compute-seconds consumed per stream-second of audio (lower is better;
1/RTF = how many concurrent real-time streams one chip sustains).
Baseline target (BASELINE.json): <= 0.002 at 256 streams on one v5e.
`vs_baseline` = value / 0.002 (< 1.0 beats the target).

Timing note: on the axon-tunneled TPU, `block_until_ready` returns before
the computation actually finishes, so the jitted function reduces the output
to a scalar that is fetched to host — an honest full-pipeline sync without
transferring the 160 MB waveform.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fastenhancer_tpu.utils.platform import honor_jax_platforms

honor_jax_platforms()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import FLAGSHIP_KWARGS
    from fastenhancer_tpu.models import get_model

    # BENCH_CONFIG=configs/<group>/<size>.yaml benches any recipe's model —
    # every streaming family in the zoo (fastenhancer variants, bsrnn,
    # fspen, lisennet); defaults to FastEnhancer_B when unset
    cfg_path = os.environ.get("BENCH_CONFIG")
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    streams = int(os.environ.get("BENCH_STREAMS", 256 if on_tpu else 8))
    # measured: each jit dispatch through the axon tunnel costs ~24 ms
    # regardless of work (a trivial scalar op takes the same); 30 s of audio
    # keeps that fixed artifact <7% of the measurement
    seconds = float(os.environ.get("BENCH_SECONDS", 30.0 if on_tpu else 1.0))
    reps = int(os.environ.get("BENCH_REPS", 5 if on_tpu else 2))
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_DTYPE", "bf16")]
    # frames per scan step: 1 = 16 ms algorithmic latency (pure per-frame),
    # larger chunks trade latency for throughput (math identical; tested)
    chunk = int(os.environ.get("BENCH_CHUNK", 1))
    # windowed-DFT-as-matmul front/back end: MXU-friendly, measured faster
    # than the fft form for per-frame streaming (math-identical)
    stft_method = os.environ.get("BENCH_STFT", "matmul")

    sr = 16_000
    label = "FastEnhancer_B"
    kwargs = dict(FLAGSHIP_KWARGS)
    model_name = "fastenhancer.default"
    if cfg_path:
        import yaml

        cfg = yaml.safe_load(open(cfg_path))
        model_name = cfg["model"]
        kwargs = cfg["model_kwargs"]
        sr = cfg["data"]["sampling_rate"]
        label = (f"{os.path.basename(os.path.dirname(cfg_path))}/"
                 f"{os.path.splitext(os.path.basename(cfg_path))[0]}")
    if model_name == "fastenhancer.noncausal":
        raise SystemExit("fastenhancer.noncausal is offline-only (no "
                         "streaming graph) — the reference publishes no "
                         "RTF for it either")
    # every family takes stft_method (matmul = MXU windowed-DFT form, the
    # fast one for per-frame streaming; math-identical to fft). No blanket
    # try/except TypeError here: a bad config kwarg must surface, not
    # silently retry without stft_method (advisor r3)
    fe_family = model_name.startswith("fastenhancer.")
    model = get_model(model_name, **kwargs, stft_method=stft_method)
    stft_used = stft_method
    variables = model.init(jax.random.PRNGKey(0))
    variables = model.fold(variables)  # deploy-time reparam removal
    if dtype != jnp.float32:
        variables = jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
            variables, is_leaf=lambda x: x is None)

    hop = model.hop_size
    n_frames = int(seconds * sr) // hop
    n_samples = n_frames * hop
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((streams, n_samples)).astype(np.float32) * 0.05
    wav = jnp.asarray(wav, dtype)

    unroll = int(os.environ.get("BENCH_UNROLL", 4))

    # BENCH_DEVICES=N shards the streams over an N-chip dp mesh (streaming
    # inference is batch-parallel: no collectives, linear scaling over ICI)
    n_dev = int(os.environ.get("BENCH_DEVICES", 1))

    # fused Pallas block-stack kernel (ops/rnnformer_stack.py): 239 -> 147
    # us/frame end-to-end at 256 streams on v5e (1.6x), parity ~1e-7.
    # Default ON for per-frame streaming; streams are tiled over a Pallas
    # grid so large stream counts and the wide S/M/L / 48 kHz shapes fit
    # VMEM (round 1 limited this to <=512 streams and rows <= 8192).
    # Multi-chip runs it per shard under shard_map. BENCH_FUSED=0 reverts
    # to the pure-XLA scan body; any compile failure falls back to XLA.
    # bsrnn gets its own fused per-frame kernel (ops/bsrnn_stack.py): the
    # whole 6-layer dual-path LSTM stack — time cell + 31-band bidirectional
    # sweep — as ONE Pallas program (969 -> 539 us/frame at 256 streams)
    # dptransformer gets its own fused per-frame kernel (ops/dpt_stack.py):
    # causal local time attention with a rotating slot-pointer K/V cache
    # instead of the XLA path's per-frame concat+reslice cache rewrite;
    # the ln ablation runs the same RNNFormer stack kernel with its
    # unfoldable LayerNorms applied inline (plan_stack ln_eps=...);
    # time_kernel's blocks are unchanged from default, so it runs the same
    # RNNFormer stack kernel (its 2-D causal convs stay XLA either way;
    # measured 5.86e-5 -> 4.16e-5 at 256 streams).
    # fastenhancer.dprnn is deliberately NOT here: its fused kernel
    # (ops/dprnn_stack.py) is exact and parity-tested but measured a ~3%
    # NEGATIVE at the benched shape (4.03e-5 fused vs 3.90e-5 XLA,
    # dprnn_b @ 256 streams bf16 30s) — the single-scan bigru XLA path
    # pipelines the F-band sweep better than the kernel's serial in-VMEM
    # sweep. A kept-exact negative result, same posture as ops/gru_scan.py.
    use_fused = (os.environ.get("BENCH_FUSED", "1") == "1" and chunk == 1
                 and (model_name == "bsrnn"
                      or (model_name in ("fastenhancer.default",
                                         "fastenhancer.conv_stft",
                                         "fastenhancer.dptransformer",
                                         "fastenhancer.ln",
                                         "fastenhancer.time_kernel")
                          and not model.rf.post_act)))
    # bsrnn/dprnn stream() silently falls back to the XLA body when the
    # batch has no sublane-aligned kernel tile — pre-check so the metric
    # label never says "fused-stack" for a run that actually measured XLA
    # (the per-shard batch is what the kernel tiles under BENCH_DEVICES)
    if use_fused and hasattr(model, "validate_fused_batch"):
        try:
            model.validate_fused_batch(streams // max(n_dev, 1), dtype)
        except ValueError as e:
            print(f"fused path unavailable at this shape ({e}); "
                  "benching the XLA scan body", file=sys.stderr)
            use_fused = False
    fused_plan = model.build_stack_plan(variables) if use_fused else None
    mesh = None
    if n_dev > 1:
        from fastenhancer_tpu.parallel import (make_mesh, replicate,
                                               shard_batch, shard_map_stream)

        mesh = make_mesh(n_dev)
        variables = replicate(variables, mesh)
        if fused_plan is not None:
            fused_plan = replicate(fused_plan, mesh)
        wav = shard_batch(wav, mesh)

    # every family's stream() takes unroll; only bsrnn of the baselines
    # takes fused_plan (its fused band-stack kernel)
    def make_bench_fn(plan):
        def stream(v, p, w):
            if fe_family or p is not None:  # fe family / bsrnn fused stack
                return model.stream(v, w, chunk_frames=chunk, unroll=unroll,
                                    fused_plan=p)
            return model.stream(v, w, chunk_frames=chunk, unroll=unroll)

        if mesh is not None:
            # per-shard execution keeps the fused Pallas kernel usable
            # multi-chip (pallas_call does not auto-partition)
            stream_sharded = shard_map_stream(stream, mesh, n_replicated=2)
        else:
            stream_sharded = stream

        @jax.jit
        def bench_fn(v, w):
            out = stream_sharded(v, plan, w)
            return jnp.mean(jnp.abs(out.astype(jnp.float32)))
        return bench_fn

    bench_fn = make_bench_fn(fused_plan)
    # compile + warmup (host fetch forces real execution)
    try:
        _ = float(bench_fn(variables, wav))
    except Exception as e:
        if fused_plan is None:
            raise
        # keep the cause visible: an unrelated failure (OOM, bad config)
        # must not masquerade as a fused-kernel compile problem
        msg = str(e).splitlines() or [""]
        print("fused-stack path failed "
              f"({type(e).__name__}: {msg[-1][:200]}); "
              "falling back to the XLA scan body", file=sys.stderr)
        use_fused, fused_plan = False, None
        bench_fn = make_bench_fn(None)
        _ = float(bench_fn(variables, wav))

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(bench_fn(variables, wav))
        times.append(time.perf_counter() - t0)
    wall = min(times)
    audio_sec = n_samples / sr
    rtf = wall / (audio_sec * streams)

    print(json.dumps({
        "metric": f"{label} per-stream streaming RTF "
                  f"({streams} concurrent {sr//1000}kHz streams, {platform}, "
                  f"{jnp.dtype(dtype).name}, chunk={chunk}, "
                  f"stft={stft_used}"
                  f"{', fused-stack' if use_fused else ''})",
        "value": round(rtf, 7),
        "unit": "RTF wall/(audio*streams), lower=better",
        "vs_baseline": round(rtf / 0.002, 4),
    }))


if __name__ == "__main__":
    main()
