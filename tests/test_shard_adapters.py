"""Per-corpus shard builder adapters: dry runs on synthesized corpus layouts.

Each adapter (scripts/data/shard_{speech,noise,vctk,demand,dns_rir}.py)
mirrors one of the reference's per-corpus builders; these tests synthesize
the corpus directory layout, run the adapter in-process, and read the
shards back through the production reader (ShardSource) asserting the
split/chunk/metadata contract.
"""
import os

import numpy as np
import pytest

from fastenhancer_tpu.data.audio_io import write_wav
from fastenhancer_tpu.data.shard import ShardSource

SR = 16000


def _tone(seconds, freq=440.0, amp=0.2, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _read_all(shard_dir):
    return list(ShardSource(str(shard_dir)).iter_cuts(seed=0))


def test_shard_speech_adapter(tmp_path):
    from scripts.data.shard_speech import main

    corpus = tmp_path / "speech"
    (corpus / "sub").mkdir(parents=True)
    write_wav(str(corpus / "a.wav"), _tone(1.0), SR)
    write_wav(str(corpus / "sub" / "b.wav"), _tone(2.0, 220.0), SR)
    write_wav(str(corpus / "short.wav"), _tone(0.2), SR)   # < min-sec
    write_wav(str(corpus / "silent.wav"), np.zeros(SR, np.float32), SR)

    main(["-n", "dns", "-d", str(corpus), "-s", str(tmp_path / "shards"),
          "--min-sec", "0.5", "-j", "1"])
    cuts = _read_all(tmp_path / "shards" / "dns")
    assert len(cuts) == 2  # short + silent filtered out
    for c in cuts:
        assert c.custom["rms"] > 0
        assert c.audio.ndim == 1 and len(c.audio) >= SR // 2
    assert os.path.exists(tmp_path / "shards" / ".dns.done")
    # rerun without --force refuses to overwrite (reference :198-207)
    main(["-n", "dns", "-d", str(corpus), "-s", str(tmp_path / "shards"),
          "-j", "1"])
    assert len(_read_all(tmp_path / "shards" / "dns")) == 2


def test_shard_noise_adapter_chunks_per_channel(tmp_path):
    from scripts.data.shard_noise import main

    corpus = tmp_path / "noise"
    corpus.mkdir()
    # 25 s stereo file -> chunks of 10 s, last 5 s dropped (min-sec 9)
    rng = np.random.default_rng(0)
    stereo = (rng.standard_normal((int(25 * SR), 2)) * 0.1).astype(np.float32)
    write_wav(str(corpus / "n0.wav"), stereo, SR)
    write_wav(str(corpus / "short.wav"),
              (rng.standard_normal(SR) * 0.1).astype(np.float32), SR)

    main(["-n", "dns", "-d", str(corpus), "-s", str(tmp_path / "shards"),
          "--chunk-sec", "10", "--min-sec", "9", "-j", "1"])
    cuts = _read_all(tmp_path / "shards" / "dns")
    # 2 channels x 2 chunks (short.wav is under min-sec entirely)
    assert len(cuts) == 4
    ids = sorted(c.id for c in cuts)
    assert ids == ["0_ch0_0", "0_ch0_1", "0_ch1_0", "0_ch1_1"]
    for c in cuts:
        assert abs(len(c.audio) - 10 * SR) <= 1
        assert c.custom["rms"] > 0


def test_shard_vctk_adapter_split(tmp_path):
    from scripts.data.shard_vctk import main

    corpus = tmp_path / "vctk"
    for spk in ("p225", "p232", "p257", "p300"):
        (corpus / spk).mkdir(parents=True)
        for k in range(2):
            write_wav(str(corpus / spk / f"{spk}_{k:03d}.wav"),
                      _tone(0.8, 200.0 + 10 * k), SR)

    main(["-n", "vctk-train", "-d", str(corpus),
          "-s", str(tmp_path / "shards"), "--split", "train", "-j", "1"])
    main(["-n", "vctk-test", "-d", str(corpus),
          "-s", str(tmp_path / "shards"), "--split", "test", "-j", "1"])
    train = _read_all(tmp_path / "shards" / "vctk-train")
    test = _read_all(tmp_path / "shards" / "vctk-test")
    assert len(train) == 4   # p225 + p300
    assert len(test) == 4    # p232 + p257 (the VBD test speakers)


def test_shard_demand_adapter_scene_split(tmp_path):
    from scripts.data.shard_demand import main

    corpus = tmp_path / "demand"
    rng = np.random.default_rng(1)
    for scene in ("DKITCHEN_16k", "TBUS_16k"):  # train / test scene
        (corpus / scene).mkdir(parents=True)
        write_wav(str(corpus / scene / "ch01.wav"),
                  (rng.standard_normal(int(21 * SR)) * 0.1
                   ).astype(np.float32), SR)

    main(["-n", "demand-train", "-d", str(corpus),
          "-s", str(tmp_path / "shards"), "--split", "train",
          "--chunk-sec", "10", "--min-sec", "9", "-j", "1"])
    main(["-n", "demand-test", "-d", str(corpus),
          "-s", str(tmp_path / "shards"), "--split", "test",
          "--chunk-sec", "10", "--min-sec", "9", "-j", "1"])
    train = _read_all(tmp_path / "shards" / "demand-train")
    test = _read_all(tmp_path / "shards" / "demand-test")
    assert len(train) == 2 and len(test) == 2  # 21 s -> 2 x 10 s chunks


def test_shard_dns_rir_adapter(tmp_path):
    from scripts.data.shard_dns_rir import main

    rir_dir = tmp_path / "rirs"
    rir_dir.mkdir()
    rng = np.random.default_rng(2)
    onset = 480  # 30 ms at 16 kHz
    rir = np.zeros(SR // 2, np.float32)
    rir[onset] = 1.0
    tail = SR // 2 - onset - 1
    decay = np.exp(-np.arange(tail) / (0.12 * SR))
    rir[onset + 1:] += (0.4 * rng.standard_normal(tail) * decay
                        ).astype(np.float32)
    # stereo RIR so the channel column is exercised
    write_wav(str(rir_dir / "r0.wav"), np.stack([rir, 0.5 * rir], 1), SR)
    write_wav(str(rir_dir / "r1.wav"), rir, SR)
    csv = tmp_path / "rirs.csv"
    csv.write_text("path,channel,t60,c50,is_real\n"
                   "r0.wav,2,0.30,12.5,1\n"
                   "r1.wav,1,0.15,18.0,0\n"
                   "missing.wav,1,0.5,1.0,0\n")

    main(["-n", "dns-rir", "--csv", str(csv), "-d", str(rir_dir),
          "-s", str(tmp_path / "shards"), "-j", "1"])
    cuts = sorted(_read_all(tmp_path / "shards" / "dns-rir"),
                  key=lambda c: c.id)
    assert len(cuts) == 2  # missing file reported, not fatal
    c0, c1 = cuts
    assert abs(c0.custom["onset_sample"] - onset) <= 32
    assert c0.custom["t60"] == pytest.approx(0.30)
    assert c0.custom["c50"] == pytest.approx(12.5)
    assert c0.custom["is_real"] is True
    assert c1.custom["is_real"] is False
    # channel 2 of the stereo file is the half-gain copy (direct-path tap)
    assert c0.audio[onset] == pytest.approx(0.5, abs=0.02)
    assert c1.audio[onset] == pytest.approx(1.0, abs=0.02)

    # the production _pick_rir consumes the reference onset key
    from fastenhancer_tpu.data.shard import ShardDataset  # noqa: F401  (import sanity)


def test_pick_rir_accepts_reference_onset_key(tmp_path):
    """Reference-built shards store custom.onset_sample; shard_wavdir
    stores rir_onset — both must reach the mixer."""
    import types

    from fastenhancer_tpu.data import shard as shard_mod

    class FakeCut:
        def __init__(self, custom):
            self.audio = np.zeros(100, np.float32)
            self.audio[7] = 1.0
            self.custom = custom

    class FakeAux:
        def __init__(self, cut):
            self._cut = cut

        def draw(self):
            return self._cut

    ds = types.SimpleNamespace(rir=FakeAux(FakeCut({"onset_sample": 42,
                                                    "t60": 0.25})))
    rir, onset, t60 = shard_mod.ShardDataset._pick_rir(ds, None, 100)
    assert onset == 42 and t60 == 0.25
    ds = types.SimpleNamespace(rir=FakeAux(FakeCut({"rir_onset": 13,
                                                    "rir_t60": 0.4})))
    _, onset, t60 = shard_mod.ShardDataset._pick_rir(ds, None, 100)
    assert onset == 13 and t60 == 0.4
    # no metadata: argmax fallback
    ds = types.SimpleNamespace(rir=FakeAux(FakeCut({})))
    _, onset, _ = shard_mod.ShardDataset._pick_rir(ds, None, 100)
    assert onset == 7
