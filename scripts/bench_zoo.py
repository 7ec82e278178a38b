"""Whole-zoo serving benchmark: one row per model family.

Reproduces the README's measured-RTF tables in one command by running
`bench.py` once per recipe (fresh interpreter per row — each family
compiles its own XLA program and the axon tunnel prefers clean processes):

    python -m scripts.bench_zoo                 # default row set
    python -m scripts.bench_zoo configs/others/bsrnn_s.yaml ...
    BENCH_STREAMS=512 python -m scripts.bench_zoo

The reference publishes single-thread CPU RTFs for every family
(/root/reference/README.md:53-142); the TPU serving shape is many
concurrent streams, so rows report per-stream RTF at BENCH_STREAMS
(default 256) and the implied real-time streams per chip.
"""
import argparse
import json
import os
import subprocess
import sys

DEFAULT_ROWS = [
    "configs/fastenhancer/t.yaml",
    "configs/fastenhancer/b.yaml",
    "configs/fastenhancer/s.yaml",
    "configs/fastenhancer/m.yaml",
    "configs/fastenhancer/l.yaml",
    "configs/ablation/dprnn_b.yaml",
    "configs/ablation/dpt_b.yaml",
    "configs/ablation/ln_b.yaml",
    "configs/ablation/time_kernel_b.yaml",
    "configs/others/lisennet.yaml",
    "configs/others/fspen.yaml",
    "configs/others/bsrnn_s.yaml",
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=None)
    ap.add_argument("--timeout", type=int, default=560,
                    help="per-row wall clock cap (s)")
    args = ap.parse_args(argv)
    rows = args.configs or DEFAULT_ROWS

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for cfg in rows:
        env = dict(os.environ, BENCH_CONFIG=cfg)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(repo, "bench.py")],
                capture_output=True, text=True, env=env, cwd=repo,
                timeout=args.timeout)
        except subprocess.TimeoutExpired:
            print(f"[timeout] {cfg} (> {args.timeout}s; try "
                  f"BENCH_SECONDS=10 BENCH_REPS=2)", flush=True)
            continue
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
            else ""
        try:
            rec = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            print(f"[fail] {cfg}: {proc.stderr.strip().splitlines()[-1:]}",
                  flush=True)
            continue
        rec["config"] = cfg
        results.append(rec)
        print(f"[ok] {cfg}: {rec['value']:.3e}", flush=True)

    if not results:
        sys.exit(1)
    print("\n| config | per-stream RTF | real-time streams/chip | "
          "vs 2e-3 target |")
    print("|---|---|---|---|")
    for r in results:
        rtf = r["value"]
        print(f"| `{r['config']}` | {rtf:.3e} | {1.0 / rtf / 1000.0:.1f}k "
              f"| {r['vs_baseline']:.4f} |")


if __name__ == "__main__":
    main()
