"""Deployment path: fold reparameterizations, AOT-compile the streaming
step, verify streaming==offline, and benchmark per-frame RTF.

Analog of the reference's scripts/export_onnx.py / export_onnx_spec.py
(:61-195). Instead of an ONNX graph with cache-list plumbing, the TPU deploy
artifact is (a) a folded parameter pytree (plain conv/linear/GRU weights —
the same `remove_weight_reparameterizations` math, applied as a pure tree
transform) and (b) an AOT-compiled jax streaming step whose carry pytree is
the cache. `jax.export` serializes the compiled step when requested.

    python -m scripts.export -n NAME [--epoch E] [--streams 1]
        [--test-streaming] [--save PATH] [--seconds 10]
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
    ap.add_argument("--streams", type=int, default=1,
                    help="concurrent streams in the compiled step")
    ap.add_argument("--test-streaming", action="store_true",
                    help="verify frame-by-frame == offline on a test wav")
    ap.add_argument("--wav", default="/root/reference/onnx/p232_013.wav")
    ap.add_argument("--save", default=None,
                    help="serialize the compiled step via jax.export")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--no-fold", action="store_true")
    ap.add_argument("--stft-method", default=None,
                    choices=["fft", "matmul"],
                    help="override the STFT form for the exported step "
                         "(matmul = MXU windowed DFT, ~25%% faster per-frame "
                         "streaming on TPU; math-identical)")
    ap.add_argument("--spec2spec", action="store_true",
                    help="compile the spec-in/spec-out step (STFT outside), "
                         "the form the paper's RTFs use "
                         "(reference: scripts/export_onnx_spec.py)")
    ap.add_argument("--fused", action="store_true",
                    help="fuse the RNNFormer block stack into one Pallas "
                         "program in the exported step (folded "
                         "fastenhancer.default family only; 1.6x at 256 "
                         "streams on v5e — see docs/performance.md)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastenhancer_tpu.utils.hparams import get_hparams
    from fastenhancer_tpu.wrappers import get_wrapper
    from fastenhancer_tpu.data import read_wav

    hps = get_hparams(None, base_dir=os.path.join(args.base_dir, args.name))
    wrapper = get_wrapper(hps.wrapper)(hps, train=False)
    if not wrapper.load(args.epoch):
        raise FileNotFoundError(f"no checkpoint in {hps.base_dir}")
    model = wrapper.model
    if args.stft_method:
        import dataclasses

        model.stft_cfg = dataclasses.replace(model.stft_cfg,
                                             method=args.stft_method)
        print(f"stft method -> {args.stft_method}")
    variables = jax.tree.map(lambda x: x, wrapper.state["variables"],
                             is_leaf=lambda x: x is None)
    if not args.no_fold:
        variables = model.fold(variables)
        print("folded reparameterizations (weight-norm/BN/pre-norm)")

    hop = model.hop_size
    b = args.streams

    def _check_fused_batch():
        # dprnn/bsrnn kernels need a sublane-aligned batch tile — surface
        # the requirement as a CLI error instead of a deep Mosaic one
        if hasattr(model, "validate_fused_batch"):
            try:
                model.validate_fused_batch(b, jnp.float32)
            except ValueError as e:
                ap.error(f"--fused with --streams {b}: {e}")

    if args.spec2spec:
        n_freq_in = model.stft_cfg.n_freq - 1  # fastenhancer drops last bin

        if args.fused:
            import inspect

            if args.no_fold:
                ap.error("--fused requires folded variables (drop --no-fold)")
            # the spec2spec fused step threads ONE carry value through
            # model_forward_fused(variables, plan, spec, <carry>) — true
            # for the GRU-carry families (default/conv_stft/ln stacked h,
            # time_kernel's nested conv-cache dict, dprnn's f-major h) but
            # not dptransformer (separate kc/vc/bias feeds) or bsrnn (no
            # spec2spec fused form); those export via the wav2wav --fused
            # step instead, which is uniform across the zoo.
            if not hasattr(model, "model_forward_fused") or len(
                    inspect.signature(
                        model.model_forward_fused).parameters) != 4:
                ap.error(
                    "--spec2spec --fused needs a single-carry "
                    "model_forward_fused; this family exports fused via "
                    "the wav2wav form (drop --spec2spec)")
            _check_fused_batch()
            # NOTE: the fused plan is closed over, so it is baked into the
            # jax.export artifact as CONSTANTS — the block-stack weights of
            # THIS checkpoint. The .params.pkl shipped alongside still holds
            # the full variables (incl. the now-unused rf_blocks leaves);
            # substituting a different checkpoint's params at run time would
            # silently keep the export-time block weights. Re-export per
            # checkpoint for --fused artifacts (same constraint as the
            # wav2wav --fused form below).
            plan = model.build_stack_plan(variables)
            carry0 = model.init_streaming_carry(b, fused=True)

            def forward(variables, spec, h):
                # block stack as one Pallas program (the paper's RTF form +
                # the fused kernel)
                return model.model_forward_fused(variables, plan, spec, h)
        else:
            carry0 = model.init_streaming_carry(b)

            def forward(variables, spec, h):
                mask, h_t, _ = model.model_forward(
                    variables["params"], variables["stats"], spec,
                    h0=h, train=False)
                return mask, h_t

        def step(variables, carry, spec):
            # spec [B, F, 1, 2] compressed -> enhanced compressed spec
            mask, h_t = forward(variables, spec, carry["h"])
            spec_hat = model.complex_mask_mul(spec, mask)
            return dict(carry, h=h_t), spec_hat

        feed = jnp.zeros((b, n_freq_in, 1, 2), jnp.float32)
    elif args.fused:
        if args.no_fold:
            ap.error("--fused requires folded variables (drop --no-fold)")
        _check_fused_batch()
        plan = model.build_stack_plan(variables)

        def step(variables, carry, wav_hop):
            # streaming_step_fused(variables, plan, carry, wav_hop) is the
            # uniform fused entry across the zoo (default/conv_stft/
            # time_kernel/dprnn/dptransformer/ln and bsrnn); the model's
            # fused=True carry supplies the right layout per family
            return model.streaming_step_fused(variables, plan, carry, wav_hop)

        carry0 = model.init_streaming_carry(b, fused=True)
        feed = jnp.zeros((b, hop), jnp.float32)
    else:
        def step(variables, carry, wav_hop):
            return model.streaming_step(variables, carry, wav_hop)

        carry0 = model.init_streaming_carry(b)
        feed = jnp.zeros((b, hop), jnp.float32)
    # donate the carry: the step updates it in place on device (no per-tick
    # output allocation; the runner's cache-feedback loop rebinds it anyway)
    lowered = jax.jit(step, donate_argnums=(1,)).lower(variables, carry0, feed)
    compiled = lowered.compile()
    print(f"AOT-compiled {'spec2spec' if args.spec2spec else 'wav2wav'} "
          f"streaming step: {b} stream(s), hop {hop}")

    if args.save:
        import pickle

        from jax import export as jexport

        # pin to one device: jax.export bakes the device count into the
        # artifact, and the runner is a single-device deployment surface
        # (multi-chip serving shards streams in-process — see bench.py)
        dev = jax.devices()[0]
        exp = jexport.export(jax.jit(step, device=dev, donate_argnums=(1,)))(
            jax.device_put(variables, dev), jax.device_put(carry0, dev),
            jax.device_put(feed, dev))
        with open(args.save, "wb") as f:
            f.write(exp.serialize())
        host = jax.tree.map(
            lambda x: None if x is None else np.asarray(x),
            (variables, carry0), is_leaf=lambda x: x is None)
        # DSP meta so the spec2spec runner can do STFT/iSTFT outside the
        # artifact (reference: scripts/test_onnx_spec.py keeps the FFT out
        # of the measured graph)
        cfg = model.stft_cfg
        meta = {
            "sr": hps.data.sampling_rate,
            "hop": cfg.hop_size,
            "n_fft": cfg.n_fft,
            "window": np.asarray(cfg.window_f32),
            "synthesis_window": np.asarray(cfg.synthesis_window),
            "compression": getattr(model, "input_compression", 1.0),
            "normalized": bool(cfg.normalized),
        }
        with open(args.save + ".params.pkl", "wb") as f:
            pickle.dump((*host, meta), f)
        print(f"serialized compiled step -> {args.save} "
              f"({os.path.getsize(args.save)} bytes) "
              f"+ {args.save}.params.pkl")

    if args.test_streaming:
        if os.path.exists(args.wav):
            wav, sr = read_wav(args.wav, sr=hps.data.sampling_rate)
        else:  # no bundled corpus: synthesize a speech-like test signal
            sr = hps.data.sampling_rate
            tt = np.arange(4 * sr) / sr
            wav = sum(0.1 * np.sin(2 * np.pi * f * tt)
                      for f in (220, 440, 880, 1760))
            wav = (wav * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * tt))
                   ).astype(np.float32)
        t = len(wav) // hop * hop
        wav = wav[:t][None].astype(np.float32)
        y_stream = np.asarray(model.stream(
            variables, jnp.asarray(np.repeat(wav, b, 0))))[0]
        wav_hat = np.asarray(wrapper.infer_fn(variables, jnp.asarray(wav)))[0]
        # streaming output is delayed n_fft - hop samples (docs/docs/onnx.md)
        delay = model.stft_cfg.cache_len if hasattr(model, "stft_cfg") else 0
        a = y_stream[delay:]
        c = wav_hat[: len(a)]
        err = np.mean((a - c) ** 2)
        sig = np.mean(c ** 2)
        print(f"streaming vs offline: diff MSE {err:.3e} "
              f"(SNR {10 * np.log10(sig / max(err, 1e-20)):.1f} dB)")

    # per-tick latency benchmark, synced each tick (an unsynced host loop
    # through the tunneled dev chip queues pathologically and times
    # garbage; deployment hosts should measure with their own dispatch)
    sr = hps.data.sampling_rate
    n_frames = min(int(args.seconds * sr) // hop, 200)
    rng = np.random.default_rng(0)
    hops = jnp.asarray(
        rng.standard_normal((n_frames,) + tuple(feed.shape)), jnp.float32)
    # the step donates its carry argument — work on a copy so carry0 stays
    # alive for the scan benchmark below
    carry = jax.tree.map(jnp.array, carry0)
    # warmup
    carry, out = compiled(variables, carry, hops[0])
    np.asarray(out)
    ticks = []
    acc = 0.0
    for i in range(n_frames):
        t0 = time.perf_counter()
        carry, out = compiled(variables, carry, hops[i])
        acc += float(jnp.sum(out))  # host fetch = the frame is delivered
        ticks.append(time.perf_counter() - t0)
    ticks_ms = np.sort(np.array(ticks) * 1e3)
    pct = lambda p: float(np.percentile(ticks_ms, p))
    print(f"per-tick from this host (sync each): p50 {pct(50):.2f} ms  "
          f"p99 {pct(99):.2f} ms ({b} stream(s); checksum {acc:.3e})")

    # honest ON-CHIP per-tick latency, slope-timed (docs/performance.md
    # method): scan the exact exported step over two window lengths inside
    # one dispatch each; the wall-time difference divided by the frame
    # difference cancels every fixed host/dispatch cost. Compute is
    # deterministic, so on-chip p50 == p99 == this slope; host-side
    # percentiles (which add the serving host's dispatch) are reported by
    # scripts.run_exported.
    def scan_fn(variables, carry, feeds):
        def body(c, f):
            c2, y = step(variables, c, f)
            return c2, jnp.sum(y.astype(jnp.float32))
        carry, s = jax.lax.scan(body, carry, feeds)
        return carry, jnp.sum(s)

    scan_jit = jax.jit(scan_fn, donate_argnums=(1,))
    n1, n2 = 128, 640
    walls = {}
    for n in (n1, n2):
        feeds = jnp.asarray(rng.standard_normal((n,) + tuple(feed.shape)),
                            jnp.float32)
        best = float("inf")
        for _ in range(3):
            c = jax.tree.map(jnp.array, carry0)  # fresh (donated each call)
            t0 = time.perf_counter()
            _, s = scan_jit(variables, c, feeds)
            float(s)  # host fetch = completion
            best = min(best, time.perf_counter() - t0)
        walls[n] = best
    us = (walls[n2] - walls[n1]) / (n2 - n1) * 1e6
    budget_ms = hop / sr * 1e3
    print(f"on-chip per-tick (slope, device scan): {us:.1f} us/frame "
          f"-> {us / 1e3 / budget_ms * 100:.2f}% of the "
          f"{budget_ms:.1f} ms/hop deadline ({b} stream(s))")


if __name__ == "__main__":
    main()
