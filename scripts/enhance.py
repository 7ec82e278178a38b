"""Batch enhancement: directory of wavs -> enhanced wavs.

Analog of the reference's scripts/test_pytorch.py (:16-62): load a trained
run by name, enhance every wav in --input-dir through the offline graph, and
write the results. Usage:

    python -m scripts.enhance -n NAME [--epoch E] -i IN_DIR -o OUT_DIR
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
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    import numpy as np

    from fastenhancer_tpu.utils.hparams import get_hparams
    from fastenhancer_tpu.wrappers import get_wrapper
    from fastenhancer_tpu.data import read_wav, write_wav
    from fastenhancer_tpu.data.loader import collate

    hps = get_hparams(None, base_dir=os.path.join(args.base_dir, args.name))
    wrapper = get_wrapper(hps.wrapper)(hps, train=False)
    if not wrapper.load(args.epoch):
        raise FileNotFoundError(f"no checkpoint in {hps.base_dir}")
    os.makedirs(args.output_dir, exist_ok=True)

    files = sorted(f for f in os.listdir(args.input_dir) if f.endswith(".wav"))
    sr = hps.data.sampling_rate
    hop = wrapper.hop_size
    t0 = time.perf_counter()
    total_sec = 0.0
    for i in range(0, len(files), args.batch_size):
        chunk = files[i: i + args.batch_size]
        items = []
        for f in chunk:
            wav, file_sr = read_wav(os.path.join(args.input_dir, f), sr=sr)
            items.append({"noisy": wav.astype(np.float32),
                          "wav_len": len(wav)})
        batch = collate(items, pad_multiple=hop)
        import jax.numpy as jnp

        out = np.asarray(wrapper.infer_fn(
            wrapper.state["variables"], jnp.asarray(batch["noisy"])))
        for j, f in enumerate(chunk):
            n = int(batch["wav_len"][j])
            write_wav(os.path.join(args.output_dir, f), out[j, :n], sr)
            total_sec += n / sr
        print(f"\r{min(i + args.batch_size, len(files))}/{len(files)}",
              end="", flush=True)
    wall = time.perf_counter() - t0
    print(f"\nenhanced {len(files)} files "
          f"({total_sec:.1f}s audio) in {wall:.1f}s "
          f"(RTF {wall / max(total_sec, 1e-9):.4f})")


if __name__ == "__main__":
    main()
