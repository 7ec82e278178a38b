"""MACs calculators vs paper numbers + script smoke tests."""
import os
import subprocess
import sys

import numpy as np
import pytest

from fastenhancer_tpu.models.macs import macs_for_config


@pytest.mark.parametrize("size,expected_m", [
    ("t", 60), ("b", 262), ("s", 664), ("m", 2900), ("l", 12000)])
def test_fastenhancer_macs_match_paper(size, expected_m):
    """Paper table 1 MACs (README.md:144-251)."""
    total = macs_for_config(f"configs/fastenhancer/{size}.yaml")["total"]
    assert abs(total / 1e6 - expected_m) / expected_m < 0.03, total / 1e6


def test_macs_all_models_run():
    for cfg in ("ablation/dprnn_t", "others/bsrnn_t", "others/fspen",
                "others/lisennet"):
        out = macs_for_config(f"configs/{cfg}.yaml")
        assert out["total"] > 0


def test_clean_checkpoint_script(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    for e in (1, 2, 3):
        (run / f"{e:05d}.ckpt").write_bytes(b"x")
    r = subprocess.run(
        [sys.executable, "-m", "scripts.clean_checkpoint", str(tmp_path),
         "--keep", "1"], capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert sorted(os.listdir(run)) == ["00003.ckpt"]


def test_shard_wavdir_builder(tmp_path):
    from fastenhancer_tpu.data.audio_io import write_wav
    from fastenhancer_tpu.data.shard import ShardSource

    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        write_wav(str(wavdir / f"f{i}.wav"),
                  rng.standard_normal(16000).astype(np.float32) * 0.1, 16000)
    out = tmp_path / "shards"
    r = subprocess.run(
        [sys.executable, "-m", "scripts.data.shard_wavdir", "-i", str(wavdir),
         "-o", str(out), "--shard-size", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    cuts = list(ShardSource(str(out)).iter_cuts(seed=0))
    assert len(cuts) == 5
    assert all(len(c.audio) == 16000 for c in cuts)


def test_rir_shard_builder_metadata(tmp_path):
    from fastenhancer_tpu.data.audio_io import write_wav
    from fastenhancer_tpu.data.shard import ShardSource

    wavdir = tmp_path / "rirs"
    wavdir.mkdir()
    rng = np.random.default_rng(0)
    rir = np.zeros(4000, np.float32)
    rir[100] = 1.0
    rir[101:] = (rng.standard_normal(3899) *
                 np.exp(-np.arange(3899) / 500) * 0.3).astype(np.float32)
    write_wav(str(wavdir / "r0.wav"), rir, 16000)
    out = tmp_path / "shards"
    r = subprocess.run(
        [sys.executable, "-m", "scripts.data.shard_wavdir", "-i", str(wavdir),
         "-o", str(out), "--kind", "rir"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    cut = next(ShardSource(str(out)).iter_cuts(seed=0))
    assert abs(cut.custom["rir_onset"] - 100) < 64
    assert 0 < cut.custom["t60"] < 1.0


def test_vad_segments_and_segmented_builder(tmp_path):
    """Energy VAD splits speech bursts at silences; --segment builder writes
    one cut per utterance (reference analog: scripts/data/segment_daps.py)."""
    sys.path.insert(0, "/root/repo/scripts")
    from audiolib import vad_segments
    from fastenhancer_tpu.data.audio_io import write_wav
    from fastenhancer_tpu.data.shard import ShardSource

    sr = 16000
    rng = np.random.default_rng(0)
    burst = (np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
             * rng.standard_normal(sr) * 0.3).astype(np.float32)
    sil = np.zeros(sr, np.float32)
    x = np.concatenate([sil, burst, sil, burst, sil])

    segs = vad_segments(x, sr)
    assert len(segs) == 2
    for k, (s, e) in enumerate(segs):
        center = (2 * k + 1.5) * sr  # burst k spans [(2k+1)s, (2k+2)s]
        assert s < center < e

    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    write_wav(str(wavdir / "long.wav"), x, sr)
    out = tmp_path / "shards"
    r = subprocess.run(
        [sys.executable, "-m", "scripts.data.shard_wavdir", "-i", str(wavdir),
         "-o", str(out), "--segment"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    cuts = list(ShardSource(str(out)).iter_cuts(seed=0))
    assert [c.id for c in cuts] == ["long_000", "long_001"]
    assert all(0.5 <= c.duration <= 2.0 for c in cuts)


def test_bench_zoo_formats_rows(monkeypatch, capsys):
    """scripts/bench_zoo glue: parses each bench.py subprocess's JSON line,
    skips failing rows with a visible message, and renders the summary
    table (the actual benching is bench.py's job, mocked here)."""
    import json
    import subprocess as sp
    from scripts import bench_zoo

    def fake_run(cmd, **kwargs):
        cfg = kwargs["env"]["BENCH_CONFIG"]
        if "fspen" in cfg:
            return sp.CompletedProcess(cmd, 1, stdout="", stderr="boom")
        line = json.dumps({"metric": "m", "value": 4.0e-05,
                           "unit": "u", "vs_baseline": 0.02})
        return sp.CompletedProcess(cmd, 0, stdout=line + "\n", stderr="")

    monkeypatch.setattr(bench_zoo.subprocess, "run", fake_run)
    bench_zoo.main(["configs/fastenhancer/t.yaml", "configs/others/fspen.yaml"])
    out = capsys.readouterr().out
    assert "[ok] configs/fastenhancer/t.yaml" in out
    assert "[fail] configs/others/fspen.yaml" in out
    assert "| `configs/fastenhancer/t.yaml` | 4.000e-05 | 25.0k | 0.0200 |" in out
