"""Offline evaluation suite over a paired test set.

Analog of the reference's scripts/metrics_ns.py (:16-267): enhance the eval
set and score SISDR / PESQ / STOI / ESTOI, plus DNSMOS / SCOREQ when their
external backends are installed (torchmetrics[audio], onnxruntime — the
reference hard-imports both; here they gate with a clear message since this
environment has neither the packages nor network access for the model
weights) and WER behind --wer (whisper + jiwer + a transcript file, like
the reference's --wer flag, reference scripts/metrics_ns.py:104-111).

    python -m scripts.metrics_ns -n NAME [--epoch E] [-p a.b=v ...]
                                 [--wer] [--no-external]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastenhancer_tpu.utils.platform import honor_jax_platforms

honor_jax_platforms()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--name", required=True)
    ap.add_argument("--base_dir", default="logs")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("-p", "--params", nargs="*", default=[])
    ap.add_argument("--max-items", type=int, default=None)
    ap.add_argument("--wer", action="store_true",
                    help="score Whisper WER (needs whisper+jiwer and "
                         "data.pesq.transcript_dir in the config)")
    ap.add_argument("--no-external", action="store_true",
                    help="skip DNSMOS/SCOREQ even when their backends "
                         "are installed")
    args = ap.parse_args()

    import numpy as np

    from fastenhancer_tpu.utils.hparams import get_hparams
    from fastenhancer_tpu.wrappers import get_wrapper
    from fastenhancer_tpu.data import get_dataset_dataloader
    from fastenhancer_tpu.data.audio_io import resample
    from fastenhancer_tpu.metrics import (sisdr, stoi, estoi, have_pesq,
                                          pesq_provider)

    hps = get_hparams(None, base_dir=os.path.join(args.base_dir, args.name),
                      params=args.params)
    wrapper = get_wrapper(hps.wrapper)(hps, train=False)
    if not wrapper.load(args.epoch):
        raise FileNotFoundError(f"no checkpoint in {hps.base_dir}")

    keys = ["clean", "noisy", "wav_len"]
    if args.wer:
        keys.append("transcript")
    _, loader = get_dataset_dataloader(hps, "pesq", keys,
                                       n_devices=wrapper.n_devices)
    sr = hps.data.sampling_rate
    use_pesq = have_pesq()   # always True since metrics/pesq_native.py
    if use_pesq:
        from fastenhancer_tpu.metrics import pesq_wb
        if pesq_provider() != "pesq-lib":
            print("[metrics] PESQ via the native P.862 implementation "
                  "(install `pesq` for certified scores)")

    # external-model scorers (reference builds DNSMOS/SCOREQ unconditionally
    # at :87-102 and WER behind --wer at :104-111; here DNSMOS/SCOREQ degrade
    # to a one-line gate message when the backend is absent, WER does not —
    # asking for --wer without the backend must fail, not silently skip)
    dnsmos_fn = scoreq_fn = wer_fn = None
    if not args.no_external:
        from fastenhancer_tpu.metrics import external
        try:
            dnsmos_fn = external.make_dnsmos(sr=16_000)
        except ImportError as e:
            print(f"[metrics] DNSMOS skipped: {e}")
        try:
            scoreq_fn = external.ScoreqONNX("nmr")  # ref mode='ref' (NMR)
        except ImportError as e:
            print(f"[metrics] SCOREQ skipped: {e}")
    if args.wer:
        from fastenhancer_tpu.metrics import external

        wer_fn = external.make_wer()

    sums = {"sisdr": 0.0, "stoi": 0.0, "estoi": 0.0, "pesq": 0.0,
            "p808": 0.0, "sig": 0.0, "bak": 0.0, "ovrl": 0.0,
            "scoreq": 0.0, "wer": 0.0}
    n = 0
    n_pesq = 0
    for batch in loader:
        dev_batch, real_b = wrapper._device_batch(batch, ("clean", "noisy"))
        wav_hat = np.asarray(wrapper.infer_fn(wrapper.state["variables"],
                                              dev_batch["noisy"]))
        clean = np.asarray(dev_batch["clean"])
        for i in range(real_b):
            ln = min(int(batch["wav_len"][i]), wav_hat.shape[-1])
            c, e = clean[i, :ln], wav_hat[i, :ln]
            sums["sisdr"] += sisdr(e, c)
            sums["stoi"] += stoi(c, e, sr)
            sums["estoi"] += estoi(c, e, sr)
            if use_pesq:
                try:
                    sums["pesq"] += pesq_wb(c, e, sr)
                    n_pesq += 1
                except Exception:
                    # both providers reject degenerate items (too short /
                    # silent); score the rest instead of aborting the run
                    pass
            if dnsmos_fn or scoreq_fn or wer_fn:
                # external models all run at 16 kHz (reference resamples,
                # scripts/metrics_ns.py:140-145)
                c16 = c if sr == 16_000 else resample(c, sr, 16_000)
                e16 = e if sr == 16_000 else resample(e, sr, 16_000)
                if dnsmos_fn:
                    for k, v in dnsmos_fn(e16).items():
                        sums[k] += v
                if scoreq_fn:
                    sums["scoreq"] += scoreq_fn(e16, c16)
                if wer_fn:
                    sums["wer"] += wer_fn(batch["transcript"][i], e16) * 100
            n += 1
            print(f"\rscored {n}", end="", flush=True)
        if args.max_items and n >= args.max_items:
            break
    print()
    shown = ["sisdr", "stoi", "estoi", "pesq"]
    if dnsmos_fn:
        shown += ["p808", "sig", "bak", "ovrl"]
    if scoreq_fn:
        shown.append("scoreq")
    if wer_fn:
        shown.append("wer")
    for k in shown:
        v = sums[k]
        if k == "pesq":
            if use_pesq and n_pesq:
                print(f"{k.upper():>6}: {v / n_pesq:.4f}"
                      + (f"  ({n - n_pesq} unscorable)"
                         if n_pesq < n else ""))
            continue
        print(f"{k.upper():>6}: {v / max(n, 1):.4f}")


if __name__ == "__main__":
    main()
