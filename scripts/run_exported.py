"""Run a serialized streaming step (deployment runner).

Analog of the reference's torch-free ONNX runners (scripts/test_onnx.py:
16-51): load the jax.export artifact written by `scripts/export.py --save`,
zero-initialize the carry from the artifact's input signature, stream a wav
hop by hop with cache feedback, and report RTF. No model code or checkpoint
needed — only the artifact.

    python -m scripts.run_exported step.jaxexport --params params.pkl \
        -i in.wav -o out.wav

Caveat for `--fused` artifacts: the fused block-stack plan is baked into
the artifact as constants at export time, so feeding a DIFFERENT
checkpoint's .params.pkl would silently keep the export-time block
weights — re-export per checkpoint (see scripts/export.py).
"""
import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastenhancer_tpu.utils.platform import honor_jax_platforms

honor_jax_platforms()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--params", required=True,
                    help="pickled (variables, carry0) from scripts.export")
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--sr", type=int, default=16000,
                    help="fallback rate for pre-rate params pickles")
    args = ap.parse_args()

    import numpy as np
    import jax
    from jax import export as jexport

    from fastenhancer_tpu.data import read_wav, write_wav

    with open(args.artifact, "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(args.params, "rb") as f:
        payload = pickle.load(f)
    meta = {}
    if len(payload) == 3:
        variables, carry, third = payload
        if isinstance(third, dict):
            meta, sr = third, third["sr"]
        else:  # older pickles carried only the rate
            sr = third
    else:
        variables, carry = payload
        sr = args.sr
    variables = jax.tree.map(
        lambda x: None if x is None else jax.numpy.asarray(x), variables,
        is_leaf=lambda x: x is None)
    carry = jax.tree.map(jax.numpy.asarray, carry)

    feed_aval = exp.in_avals[-1]
    spec2spec = feed_aval.ndim == 4  # [B, F, 1, 2] vs wav2wav [B, hop]
    wav, _ = read_wav(args.input, sr=sr)
    call = exp.call
    outs = []
    ticks = []

    if spec2spec:
        # spec-domain artifact (reference: scripts/test_onnx_spec.py) —
        # STFT/iSTFT + compression run here in numpy, outside the
        # measured per-tick graph, exactly like the paper's RTF form
        assert meta, "--spec2spec artifacts need the meta-carrying pickle"
        b, f_in, _, _ = feed_aval.shape
        hop, n_fft = int(meta["hop"]), int(meta["n_fft"])
        window = meta["window"]
        comp = float(meta["compression"])
        t = (len(wav) - n_fft) // hop * hop + n_fft
        idx = np.arange(0, t - n_fft + 1, hop)
        frames = np.stack([wav[i: i + n_fft] for i in idx])
        spec = np.fft.rfft(frames * window, axis=-1)[:, : f_in]
        if meta.get("normalized"):
            spec = spec / np.sqrt(n_fft)
        spec = np.stack([spec.real, spec.imag], -1).astype(np.float32)
        mag = np.maximum(np.sqrt((spec ** 2).sum(-1, keepdims=True)), 1e-5)
        spec = spec * mag ** (comp - 1.0)
        t0 = time.perf_counter()
        for i in range(len(idx)):
            feed = np.broadcast_to(spec[i][None, :, None, :],
                                   (b, f_in, 1, 2))
            t1 = time.perf_counter()
            carry, y = call(variables, carry, jax.numpy.asarray(feed))
            y = np.asarray(y)
            ticks.append(time.perf_counter() - t1)
            outs.append(y[0, :, 0, :])
        wall = time.perf_counter() - t0
        hat = np.stack(outs)  # [T, F, 2] compressed
        mag = np.maximum(np.sqrt((hat ** 2).sum(-1, keepdims=True)), 1e-30)
        hat = hat * mag ** (1.0 / comp - 1.0)
        full = np.zeros((len(idx), n_fft // 2 + 1), np.complex64)
        full[:, : f_in] = hat[..., 0] + 1j * hat[..., 1]
        syn = np.fft.irfft(full, n=n_fft, axis=-1)
        if meta.get("normalized"):
            syn = syn * np.sqrt(n_fft)
        syn = syn * meta["synthesis_window"]
        out = np.zeros(t)
        for j, i in enumerate(idx):
            out[i: i + n_fft] += syn[j]
        # offline OLA is input-aligned (no streaming n_fft-hop delay)
    else:
        # batch and hop size from the wav input's signature ([B, hop])
        b, hop = feed_aval.shape
        t = len(wav) // hop * hop
        # the artifact is compiled for B streams; replicate the mono input
        hops = np.broadcast_to(
            wav[:t].reshape(-1, 1, hop), (t // hop, b, hop)).astype(np.float32)
        t0 = time.perf_counter()
        for i in range(hops.shape[0]):
            t1 = time.perf_counter()
            carry, y = call(variables, carry, jax.numpy.asarray(hops[i]))
            y = np.asarray(y)  # host fetch = the frame is actually delivered
            ticks.append(time.perf_counter() - t1)
            outs.append(y[0])
        wall = time.perf_counter() - t0
        out = np.concatenate(outs)
    write_wav(args.output, out, sr)
    # steady state excludes the first tick (artifact load/compile happens
    # there); denominator = audio actually processed by the steady ticks
    steady = np.array(ticks[1:])
    print(f"streamed {t / sr:.1f}s in {wall:.2f}s "
          f"(warm-up tick {ticks[0]:.2f}s) -> {args.output}")
    if not len(steady):
        print("input too short for steady-state latency stats "
              "(need > 2 hops)")
        return
    rtf = float(steady.sum()) / (len(steady) * hop / sr)
    ticks_ms = np.sort(steady * 1000.0)
    budget_ms = hop / sr * 1000.0
    pct = lambda p: float(np.percentile(ticks_ms, p))
    misses = float(np.mean(ticks_ms > budget_ms)) * 100.0
    print(f"steady-state RTF {rtf:.4f}")
    print(f"per-tick latency ms: p50 {pct(50):.2f}  p90 {pct(90):.2f}  "
          f"p99 {pct(99):.2f}  (budget {budget_ms:.1f} ms/hop, "
          f"{misses:.1f}% deadline misses)")

    # split dispatch from compute by differencing: rerun the same steady
    # ticks without the per-tick host fetch (the carry is donated on
    # device, so dispatches pipeline and part of the per-dispatch overhead
    # amortizes away); p50 minus the amortized ms/frame ~= the host
    # dispatch + fetch cost a deployment host pays per tick. The true
    # on-chip per-tick time is slope-measured by scripts.export
    # (device-scan; ~20 us/frame for FE_T).
    n_pipe = min(len(steady), 256)
    if spec2spec:
        feeds = [np.broadcast_to(spec[i][None, :, None, :],
                                 tuple(feed_aval.shape)) for i in
                 range(min(n_pipe, len(idx)))]
    else:
        feeds = [hops[i] for i in range(min(n_pipe, hops.shape[0]))]
    feeds = [jax.numpy.asarray(f) for f in feeds]
    t0 = time.perf_counter()
    for f in feeds:
        carry, y = call(variables, carry, f)
    np.asarray(y)  # single host sync at the end
    amort_ms = (time.perf_counter() - t0) / len(feeds) * 1000.0
    print(f"amortized (pipelined dispatch): {amort_ms:.3f} ms/frame; "
          f"per-dispatch overhead ~{max(pct(50) - amort_ms, 0):.2f} ms "
          f"of the p50 above (on-chip compute itself is slope-measured "
          f"by scripts.export)")


if __name__ == "__main__":
    main()
