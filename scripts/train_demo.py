"""Reproducible end-to-end training demo (the README's SISDR claim).

Builds a small real-speech corpus from the reference's bundled test audio
(/root/reference/onnx/p232_001-009.wav — 31 s of VCTK speaker p232, read
only), trains FastEnhancer_T on it from scratch, and scores held-out
SISDR/STOI before vs after. Everything is seeded; one command reproduces
the README's training numbers:

    python -m scripts.train_demo --workdir demo_run [--epochs 300]

Steps:
  1. corpus: slice the bundled 48 kHz wav into 3 s utterances, resample to
     16 kHz, mix each with seeded white+babble-shaped noise at
     SNR in {2.5, 5, 7.5, 10} dB; last 2 utterances held out.
  2. train: configs/fastenhancer/t.yaml shrunk in epochs only (model is the
     real FE_T), in-training PESQ/STOI via the native P.862 implementation,
     batch 4.
  3. eval: scripts.metrics_ns on the held-out pair, noisy-input baseline vs
     enhanced; prints the SISDR/STOI/PESQ deltas.
"""
import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BUNDLED = "/root/reference/onnx/p232_001-009.wav"
SR = 16000
UTT_SEC = 3.0


def build_corpus(workdir: str, seed: int = 0) -> dict:
    from fastenhancer_tpu.data.audio_io import read_wav, write_wav

    wav, _ = read_wav(BUNDLED, sr=SR)
    n_utt = int(len(wav) // (UTT_SEC * SR))
    rng = np.random.default_rng(seed)
    dirs = {}
    for split in ("train", "test"):
        for kind in ("clean", "noisy"):
            d = os.path.join(workdir, "corpus", split, kind)
            os.makedirs(d, exist_ok=True)
            dirs[f"{split}_{kind}"] = d
    snrs = [2.5, 5.0, 7.5, 10.0]
    for i in range(n_utt):
        clean = wav[int(i * UTT_SEC * SR): int((i + 1) * UTT_SEC * SR)]
        # seeded noise: white + a low-passed (babble-shaped) component
        white = rng.standard_normal(len(clean))
        shaped = np.convolve(rng.standard_normal(len(clean)),
                             np.ones(8) / 8.0, mode="same")
        noise = 0.5 * white + 0.5 * shaped
        snr = snrs[i % len(snrs)]
        noise *= (np.linalg.norm(clean) / max(np.linalg.norm(noise), 1e-9)
                  * 10 ** (-snr / 20))
        split = "test" if i >= n_utt - 2 else "train"
        name = f"p232_{i:03d}.wav"
        write_wav(os.path.join(dirs[f"{split}_clean"], name),
                  clean.astype(np.float32), SR)
        write_wav(os.path.join(dirs[f"{split}_noisy"], name),
                  (clean + noise).astype(np.float32), SR)
    print(f"corpus: {n_utt - 2} train / 2 held-out utterances "
          f"({UTT_SEC:.0f}s each, SNRs {snrs} dB) -> {workdir}/corpus")
    return dirs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="demo_run")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import yaml

    dirs = build_corpus(args.workdir, args.seed)

    cfg = yaml.safe_load(open("configs/fastenhancer/t.yaml"))
    for mode, split in (("train", "train"), ("valid", "test"),
                        ("pesq", "test"), ("infer", "test")):
        sec = cfg["data"][mode]
        sec["clean_dir"] = dirs[f"{split}_clean"]
        sec["noisy_dir"] = dirs[f"{split}_noisy"]
        sec.pop("metadata", None)
    cfg["data"]["infer"]["files"] = []
    cfg["train"].update({"max_epochs": args.epochs, "batch_size": 4,
                         "num_workers": 2, "save_interval": args.epochs,
                         "seed": args.seed})
    cfg["data"]["train"]["segment_size"] = 32000
    # in-training PESQ/STOI every few epochs (native P.862 implementation)
    cfg["pesq"]["interval"] = max(args.epochs // 4, 1)
    cfg["infer"]["interval"] = 0
    cfg_path = os.path.join(args.workdir, "demo.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    logs = os.path.join(args.workdir, "logs")
    run = subprocess.run(
        [sys.executable, "train.py", "-n", "demo", "-c", cfg_path,
         "--base_dir", logs, "-f"], env=dict(os.environ))
    if run.returncode != 0:
        sys.exit(run.returncode)

    # score held-out: noisy baseline, then the trained model
    from fastenhancer_tpu.metrics import sisdr, stoi
    from fastenhancer_tpu.data.audio_io import read_wav

    from fastenhancer_tpu.metrics import pesq_wb

    base = {"sisdr": [], "stoi": [], "pesq": []}
    for f in sorted(os.listdir(dirs["test_clean"])):
        c, _ = read_wav(os.path.join(dirs["test_clean"], f))
        n, _ = read_wav(os.path.join(dirs["test_noisy"], f))
        base["sisdr"].append(sisdr(n, c))
        base["stoi"].append(stoi(c, n, SR))
        base["pesq"].append(pesq_wb(c, n, SR))
    print(f"noisy baseline: SISDR {np.mean(base['sisdr']):.2f} dB, "
          f"STOI {np.mean(base['stoi']):.3f}, "
          f"PESQ {np.mean(base['pesq']):.2f}")
    run = subprocess.run(
        [sys.executable, "-m", "scripts.metrics_ns", "-n", "demo",
         "--base_dir", logs], env=dict(os.environ))
    sys.exit(run.returncode)


if __name__ == "__main__":
    main()
