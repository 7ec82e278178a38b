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

from fastenhancer_tpu.data.audio_io import read_wav, write_wav
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
    # reference-built BRUDEX shards store t60 in ms: normalized to seconds
    ds = types.SimpleNamespace(rir=FakeAux(FakeCut({"onset_sample": 1,
                                                    "t60": 310.0})))
    _, _, t60 = shard_mod.ShardDataset._pick_rir(ds, None, 100)
    assert t60 == pytest.approx(0.31)
    # no metadata: argmax fallback
    ds = types.SimpleNamespace(rir=FakeAux(FakeCut({})))
    _, onset, _ = shard_mod.ShardDataset._pick_rir(ds, None, 100)
    assert onset == 7


def test_shard_brudex_adapter(tmp_path):
    from scripts.data.shard_brudex import main

    corpus = tmp_path / "brudex"
    rng = np.random.default_rng(3)
    rir = np.zeros(SR // 4, np.float32)
    rir[100] = 1.0
    rir[101:] = (0.3 * rng.standard_normal(SR // 4 - 101)
                 * np.exp(-np.arange(SR // 4 - 101) / (0.05 * SR))
                 ).astype(np.float32)
    (corpus / "rev_low").mkdir(parents=True)
    (corpus / "rev_high").mkdir()
    write_wav(str(corpus / "rev_low" / "a.wav"),
              np.stack([rir, 0.5 * rir], 1), SR)   # stereo -> 2 cuts
    write_wav(str(corpus / "rev_high" / "b.wav"), rir, SR)

    main(["-n", "brudex", "-b", str(corpus), "-s", str(tmp_path / "shards"),
          "-j", "1"])
    cuts = sorted(_read_all(tmp_path / "shards" / "brudex"),
                  key=lambda c: c.id)
    assert [c.id for c in cuts] == [
        "rev_high_b_ch00_1", "rev_low_a_ch00_0", "rev_low_a_ch01_0"]
    # seconds (the consumer's unit; the reference adapter writes ms)
    assert cuts[0].custom["t60"] == pytest.approx(1.30)
    assert cuts[1].custom["t60"] == pytest.approx(0.31)
    assert all(c.custom["is_real"] is True for c in cuts)
    assert all(abs(c.custom["onset_sample"] - 100) <= 2 for c in cuts)
    # channel split: ch01 is the half-gain copy
    assert cuts[2].audio[100] == pytest.approx(0.5, abs=0.02)


def test_shard_myriad_adapter(tmp_path):
    from scripts.data.shard_myriad import main

    corpus = tmp_path / "myriad"
    rir = np.zeros(SR // 4, np.float32)
    rir[50] = 0.9
    (corpus / "SAL" / "pos1").mkdir(parents=True)
    (corpus / "AIL" / "pos2").mkdir(parents=True)
    write_wav(str(corpus / "SAL" / "pos1" / "r.wav"), rir, SR)
    write_wav(str(corpus / "AIL" / "pos2" / "q.wav"), rir, SR)

    main(["-n", "myriad", "-b", str(corpus), "-s", str(tmp_path / "shards"),
          "-j", "1"])
    cuts = sorted(_read_all(tmp_path / "shards" / "myriad"),
                  key=lambda c: c.id)
    # entries sorted globally: AIL path sorts before SAL
    assert [c.id for c in cuts] == ["AIL_pos2_q_0", "SAL_pos1_r_1"]
    assert cuts[0].custom["t60"] == pytest.approx(0.5)   # seconds
    assert cuts[1].custom["t60"] == pytest.approx(2.1)
    assert all(c.custom["onset_sample"] == 50 for c in cuts)


def test_gen_rir_csvs(tmp_path, capsys):
    from scripts.data.gen_brudex_csv import main as brudex_main
    from scripts.data.gen_myriad_csv import main as myriad_main

    bx = tmp_path / "brudex"
    (bx / "rev_medium").mkdir(parents=True)
    rir = np.zeros(1000, np.float32)
    rir[10] = 1.0
    write_wav(str(bx / "rev_medium" / "a.wav"), np.stack([rir] * 3, 1), SR)
    out = tmp_path / "brudex.csv"
    brudex_main(["--base-dir", str(bx), "-o", str(out)])
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "path,channel,t60"
    assert lines[1:] == ["rev_medium/a.wav,1,0.51",
                         "rev_medium/a.wav,2,0.51",
                         "rev_medium/a.wav,3,0.51"]

    my = tmp_path / "myriad"
    (my / "SAL" / "sub").mkdir(parents=True)
    write_wav(str(my / "SAL" / "sub" / "r.wav"), rir, SR)
    out2 = tmp_path / "myriad.csv"
    myriad_main(["--base-dir", str(my), "-o", str(out2)])
    assert out2.read_text().strip().splitlines()[1] == "SAL/sub/r.wav,1,2.1"
    # the generated CSV feeds shard_dns_rir-style loaders: 3 columns
    capsys.readouterr()


def test_preprocess_brudex_mat_roundtrip(tmp_path):
    from scripts.data.preprocess_brudex import main

    src = tmp_path / "mat"
    (src / "room1").mkdir(parents=True)
    sr_in = 48000
    t = np.arange(sr_in // 2) / sr_in
    data = np.stack([np.sin(2 * np.pi * 500 * t),
                     0.25 * np.sin(2 * np.pi * 800 * t)], axis=1)

    # MAT v7.3 (HDF5): MATLAB stores [T, C] column-major, so the h5py view
    # is transposed
    import h5py

    with h5py.File(str(src / "room1" / "a.mat"), "w") as f:
        f["data"] = data.T
        f["fs"] = np.array([[float(sr_in)]])
    # pre-7.3 MAT via scipy
    from scipy.io import savemat

    savemat(str(src / "b.mat"), {"data": data, "fs": sr_in})

    out = tmp_path / "wav16"
    main(["--from-dir", str(src), "--to-dir", str(out), "--to-sr", "16000",
          "--num-workers", "1"])
    for rel in ("room1/a.wav", "b.wav"):
        y, sr = read_wav(str(out / rel), mono=False)
        assert sr == 16000
        assert y.shape == (2, sr_in // 2 // 3)   # 48k -> 16k
        assert np.abs(y).max() == pytest.approx(0.99, abs=0.02)
        # channel order preserved: ch1 is the quarter-gain 800 Hz tone
        assert np.abs(y[1]).max() < 0.5 * np.abs(y[0]).max()


def test_preprocess_expresso(tmp_path):
    from scripts.data.preprocess_expresso import main, split_vad_based

    root = tmp_path / "audio_48khz"
    sr = SR

    def tone(sec, f=440.0, amp=0.3):
        tt = np.arange(int(sec * sr)) / sr
        return (amp * np.sin(2 * np.pi * f * tt)).astype(np.float32)

    conv = root / "conversational" / "ex01"
    conv.mkdir(parents=True)
    stereo = np.stack([tone(5.0), tone(5.0, 220.0)], 1)
    write_wav(str(conv / "ex01_convo.wav"), stereo, sr)

    lf = root / "read" / "spk1" / "narration" / "longform"
    lf.mkdir(parents=True)
    write_wav(str(lf / "spk1_narr_long.wav"), tone(3.0), sr)
    # a base-only style dir -> symlinked whole
    (root / "read" / "spk1" / "enunciated" / "base").mkdir(parents=True)

    vad = tmp_path / "VAD_segments.txt"
    vad.write_text(
        "ex01_convo/channel1\t(0.50, 3.00)\n"
        "ex01_convo/channel2\t(2.50, 4.00)\n"
        "spk1_narr_long\t(0.20, 2.80)\n")

    out = root / "segmented"
    main(["--dataset-root", str(root), "--vad-file", str(vad),
          "--output-dir", str(out)])
    y, _ = read_wav(str(out / "conversational" / "ex01"
                        / "ex01_convo_0000.wav"))
    assert len(y) == int(3.5 * sr)  # union of (0.5,3.0)+(2.5,4.0)
    y2, _ = read_wav(str(out / "read" / "spk1" / "narration" / "longform"
                         / "spk1_narr_long_0000.wav"))
    assert len(y2) == int(2.6 * sr)
    assert os.path.islink(out / "read" / "spk1" / "enunciated")

    # vad sub-split searches BACKWARD for the last silence in the window
    audio = np.concatenate([tone(8.0), np.zeros(sr, np.float32), tone(3.0)])
    subs = split_vad_based(audio, sr, max_dur=10.0, min_dur=5.0)
    assert len(subs) == 2
    assert 8.8 * sr <= len(subs[0]) <= 9.1 * sr  # cut near the gap's END


def test_shard_hifitts_adapter(tmp_path):
    from scripts.data.shard_hifitts1 import main

    corpus = tmp_path / "hifitts"
    (corpus / "spk" / "book").mkdir(parents=True)
    write_wav(str(corpus / "spk" / "book" / "u1.wav"), _tone(1.0), SR)
    write_wav(str(corpus / "spk" / "book" / "u2.wav"),
              np.zeros(SR, np.float32), SR)   # zero active RMS -> skipped

    main(["-n", "hifitts", "-d", str(corpus), "-s", str(tmp_path / "shards"),
          "-e", "wav", "-j", "1"])
    cuts = _read_all(tmp_path / "shards" / "hifitts")
    assert len(cuts) == 1 and cuts[0].custom["rms"] > 0


def test_run_adapter_cleans_stale_crashed_run(tmp_path):
    """A crashed build (shards on disk, no .done marker) must not leak its
    stale cuts.* files into a rerun — the reader globs cuts.* and would
    silently train on both generations."""
    from scripts.data.shard_speech import main

    corpus = tmp_path / "speech"
    corpus.mkdir()
    write_wav(str(corpus / "a.wav"), _tone(1.0), SR)

    # simulate a crashed previous run: stale shard files, no marker
    root = tmp_path / "shards" / "dns"
    root.mkdir(parents=True)
    (root / "cuts.000007.jsonl.gz").write_bytes(b"stale")
    (root / "recording.000007.tar").write_bytes(b"stale")

    main(["-n", "dns", "-d", str(corpus), "-s", str(tmp_path / "shards"),
          "-j", "1"])
    assert not (root / "cuts.000007.jsonl.gz").exists()
    assert not (root / "recording.000007.tar").exists()
    assert len(_read_all(root)) == 1


def test_directories_mix_probabilities_validated(tmp_path):
    """Mix probabilities summing above 1 would give random.choices a
    negative no-mix weight (silently corrupting sampling) — must raise."""
    from scripts.data.corpus_utils import Directories

    d = tmp_path / "pool"
    d.mkdir()
    write_wav(str(d / "x.wav"), _tone(0.3), SR)
    with pytest.raises(ValueError, match="sum"):
        Directories([str(d)], mix={"a": 0.7, "b": 0.6})
    # a valid mix still carries the no-mix remainder
    ok = Directories([str(d)], mix={"a": 0.25, "b": 0.25})
    assert ok.names_to_mix[-1] == ""
    assert abs(ok.probabilities[-1] - 0.5) < 1e-9
