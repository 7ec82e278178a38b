"""Reusable lhotse-shar-compatible shard writer + adapter harness.

The reference's 14 per-corpus builders all share one skeleton
(reference: scripts/data/shard_speech.py:216-258): collect files, process
each in a worker pool (resample, filter, corpus quirks, custom metadata),
stream cuts into lhotse's SharWriter in shards of 1000. `ShardWriter`
reproduces the on-disk contract our reader consumes
(fastenhancer_tpu/data/shard.py: cuts.NNNNNN.jsonl.gz + recording.NNNNNN.tar)
without lhotse; `run_adapter` is the pool/progress/done-marker harness the
per-corpus CLIs (`shard_speech`, `shard_noise`, `shard_vctk`,
`shard_demand`, `shard_dns_rir`) plug into.

Audio is stored as 16-bit wav (no flac encoder in this environment; the
reader accepts flac too when soundfile is installed).
"""
from __future__ import annotations

import gzip
import io
import json
import os
import tarfile
import typing as tp
import wave as wave_mod
from concurrent.futures import ProcessPoolExecutor

import numpy as np

Cut = tp.Dict[str, tp.Any]  # {"id", "audio", "sr"[, "custom"]}


def wav_bytes(x: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    pcm = np.clip(x * 32768.0, -32768, 32767).astype("<i2")
    with wave_mod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


class ShardWriter:
    """Streams cuts into cuts.NNNNNN.jsonl.gz + recording.NNNNNN.tar pairs."""

    def __init__(self, out_dir: str, shard_size: int = 1000):
        self.out_dir = out_dir
        self.shard_size = shard_size
        os.makedirs(out_dir, exist_ok=True)
        self.shard_idx = 0
        self.written = 0
        self.total_sec = 0.0
        self._tar: tp.Optional[tarfile.TarFile] = None
        self._metas: tp.List[dict] = []

    def write(self, cut: Cut) -> None:
        if self._tar is None:
            self._tar = tarfile.open(os.path.join(
                self.out_dir, f"recording.{self.shard_idx:06d}.tar"), "w")
        audio = np.asarray(cut["audio"], np.float32)
        sr = int(cut["sr"])
        meta = {"id": cut["id"], "duration": len(audio) / sr}
        if cut.get("custom"):
            meta["custom"] = cut["custom"]
        data = wav_bytes(audio, sr)
        info = tarfile.TarInfo(f"{cut['id']}.wav")
        info.size = len(data)
        self._tar.addfile(info, io.BytesIO(data))
        self._metas.append(meta)
        self.written += 1
        self.total_sec += meta["duration"]
        if self.written % self.shard_size == 0:
            self._flush()

    def _flush(self) -> None:
        if self._tar is None:
            return
        self._tar.close()
        with gzip.open(os.path.join(
                self.out_dir,
                f"cuts.{self.shard_idx:06d}.jsonl.gz"), "wt") as f:
            for m in self._metas:
                f.write(json.dumps(m) + "\n")
        self.shard_idx += 1
        self._tar = None
        self._metas = []

    def close(self) -> str:
        self._flush()
        h, rem = divmod(int(self.total_sec), 3600)
        desc = (f"{self.written} cuts, {self.total_sec:.1f}s "
                f"({h}h{rem // 60:02d}m) across {self.shard_idx} shards")
        return desc

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def run_adapter(
    jobs: tp.Sequence,
    process_one: tp.Callable[[tp.Any], tp.Union[tp.List[Cut], str]],
    out_dir: str,
    name: str,
    shard_size: int = 1000,
    num_jobs: int = 1,
    force: bool = False,
) -> tp.Optional[str]:
    """Pool-process `jobs` with `process_one` (returns cuts, or an error/skip
    string) and stream results into `out_dir/name`. Writes a `.{name}.done`
    marker like the reference (:198-207); returns the summary, or None when
    the marker exists and force is False."""
    root = os.path.join(out_dir, name)
    done = os.path.join(out_dir, f".{name}.done")
    if os.path.exists(done):
        if not force:
            print(f"{name}: previous shards found; use --force to overwrite")
            return None
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    n = 0
    with ShardWriter(root, shard_size) as writer:
        if num_jobs > 1:
            pool = ProcessPoolExecutor(num_jobs)
            results = pool.map(process_one, jobs, chunksize=4)
        else:
            results = map(process_one, jobs)
        for res in results:
            if isinstance(res, str):
                print(res)
            else:
                for cut in res:
                    writer.write(cut)
            n += 1
            if n % 20 == 0:
                print(f"\r{n}/{len(jobs)}", end="", flush=True)
        if num_jobs > 1:
            pool.shutdown()
        desc = writer.close()
    with open(done, "w") as f:
        f.write(desc + "\n")
    print(f"\n{name}: {desc} -> {root}")
    return desc
