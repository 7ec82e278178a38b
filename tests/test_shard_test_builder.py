"""Test-set synthesizer (scripts/data/shard_test.py) + corpus_utils.

Mirrors the reference's scripts/data/shard_test.py: a fixed evaluation
set where every cut freezes its degradation recipe — parallel noise /
rir / farend / echo tars plus per-cut SNR/SER/dbFS supervision custom —
and scripts/data/utils.py's samplers. Synthesized corpora throughout.
"""
import os
import random

import numpy as np
import pytest
import yaml

from fastenhancer_tpu.data.audio_io import read_wav, write_wav
from fastenhancer_tpu.data.shard import ShardSource

SR = 16000


def _tone(seconds, freq=440.0, amp=0.2):
    t = np.arange(int(seconds * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _noise(seconds, seed=0, amp=0.1):
    rng = np.random.default_rng(seed)
    return (amp * rng.standard_normal(int(seconds * SR))).astype(np.float32)


# ---------------------------------------------------------------- utils --


def test_directories_walk_exclude_tsv(tmp_path):
    from scripts.data.corpus_utils import Directories

    root = tmp_path / "noise"
    (root / "keep").mkdir(parents=True)
    (root / "skip").mkdir()
    for i in range(3):
        write_wav(str(root / "keep" / f"n{i}.wav"), _noise(0.2, i), SR)
    write_wav(str(root / "skip" / "bad.wav"), _noise(0.2), SR)
    d = Directories([str(root)],
                    directories_to_exclude=[str(root / "skip")],
                    extension="")
    assert len(d) == 3
    random.seed(0)
    assert all("skip" not in d.choice() for _ in range(20))

    # tsv listing: first column, relative to the tsv's parent
    tsv = root / "list.tsv"
    tsv.write_text("keep/n0.wav\tmeta\nkeep/n2.wav\tmeta\n")
    d2 = Directories([str(tsv)], extension="")
    assert len(d2) == 2
    assert os.path.exists(d2.choice())


def test_directories_dataset_concat_and_normalize(tmp_path):
    from scripts.data.corpus_utils import DirectoriesDataset

    root = tmp_path / "noise"
    root.mkdir()
    for i in range(2):
        write_wav(str(root / f"n{i}.wav"), _noise(0.5, i), SR)
    ds = DirectoriesDataset(
        {"pool": {"directories_to_include": [str(root)], "extension": "",
                  "probability": 1.0}},
        fs=SR, silence_length=0.1, activity_threshold_relative=-25.0)
    random.seed(1)
    wav, paths = ds(2.0)
    assert len(wav) == 2 * SR
    assert paths.count(".wav") >= 2  # concatenated several clips
    # clips are normalized to -25 dBFS active RMS before concat
    from scripts.audiolib import active_rms_relative

    first = wav[: int(0.5 * SR)]
    db = 20 * np.log10(active_rms_relative(first, SR) + 1e-12)
    assert abs(db - (-25.0)) < 3.0


def test_reverb_dataset_channel_and_t60(tmp_path):
    from scripts.data.corpus_utils import ReverbDataset

    rir_dir = tmp_path / "rirs"
    rir_dir.mkdir()
    rir = np.zeros(SR // 4, np.float32)
    rir[64] = 1.0
    write_wav(str(rir_dir / "r.wav"), np.stack([rir, 0.5 * rir], 1), SR)
    csv = tmp_path / "r.csv"
    csv.write_text("path,channel,t60\nr.wav,2,0.42\n")
    ds = ReverbDataset(SR, {"pool": {"csv": str(csv),
                                     "base_dir": str(rir_dir),
                                     "prob": 1.0}})
    random.seed(0)
    got, t60, onset = ds()
    assert t60 == pytest.approx(0.42)
    assert abs(onset - 64) <= 2
    assert got[64] == pytest.approx(0.5, abs=0.02)  # channel 2


# ------------------------------------------------------------ shard_test --


def _speech_corpus(tmp_path, n=3):
    sp = tmp_path / "speech"
    sp.mkdir()
    for i in range(n):
        write_wav(str(sp / f"s{i}.wav"), _tone(1.0 + 0.3 * i, 300 + 50 * i,
                                               amp=0.3), SR)
    return sp


def _noise_corpus(tmp_path):
    nz = tmp_path / "noise"
    nz.mkdir()
    for i in range(2):
        write_wav(str(nz / f"n{i}.wav"), _noise(2.0, i), SR)
    return nz


def _rir_setup(tmp_path):
    rd = tmp_path / "rirs"
    rd.mkdir()
    rir = np.zeros(SR // 8, np.float32)
    rir[32] = 1.0
    rir[33:200] = 0.2 * np.exp(-np.arange(167) / 400.0)
    write_wav(str(rd / "r0.wav"), rir, SR)
    csv = tmp_path / "rir.csv"
    csv.write_text("path,channel,t60\nr0.wav,1,0.3\n")
    return rd, csv, rir


def test_shard_test_noise_rir(tmp_path):
    from scripts.data.shard_test import main

    sp = _speech_corpus(tmp_path)
    nz = _noise_corpus(tmp_path)
    rd, csv, rir_src = _rir_setup(tmp_path)
    cfg = {
        "fs": SR, "silence_length": 0.1,
        "activity_threshold_relative": -25.0,
        "activity_threshold_absolute": -50.0,
        "input": {
            "nearend_speech": {"base_dir": str(sp), "extension": ".wav"},
            "nearend_noise": {"pool": {
                "directories_to_include": [str(nz)], "extension": "",
                "probability": 1.0}},
            "rir": {"pool": {"csv": str(csv), "base_dir": str(rd),
                             "prob": 1.0}},
        },
        "nearend": {"speech_dbFS": [-30.0, -15.0],
                    "noise": {"snr": [-5, 15, 5]},
                    "rir": {"prob": 0.5}},
    }
    cfg_path = tmp_path / "se_test.yaml"
    cfg_path.write_text(yaml.dump(cfg))

    main(["-n", "testset", "-c", str(cfg_path),
          "-s", str(tmp_path / "shards"), "-j", "1"])
    src = ShardSource(str(tmp_path / "shards" / "testset"),
                      fields=("recording", "rir", "noise"))
    cuts = sorted(src.iter_cuts(seed=0), key=lambda c: int(c.id))
    assert len(cuts) == 3
    for i, c in enumerate(cuts):
        assert len(c.audio) == int((1.0 + 0.3 * i) * SR)
        assert len(c.extras["noise"]) == len(c.audio)  # match_length
        assert c.custom["rms"] > 0 and c.custom["rms_noise"] > 0
        assert c.custom["rir_t60"] == pytest.approx(0.3)
        assert abs(c.custom["rir_onset"] - 32) <= 2
        # float32 rir field: matches the (pcm16-decoded) source RIR
        np.testing.assert_allclose(c.extras["rir"], rir_src, atol=1e-3)
        assert c.sup["snr"] in range(-5, 16, 5)
        assert -30.0 <= c.sup["dbFS"] <= -15.0
        assert isinstance(c.sup["return_rir"], bool)
    # frozen set: rerun without --force refuses
    main(["-n", "testset", "-c", str(cfg_path),
          "-s", str(tmp_path / "shards"), "-j", "1"])
    assert len(list(src.iter_cuts(seed=0))) == 3


def test_shard_test_rir_build_read_mix(tmp_path):
    """Regression (round-3): the test-set builder stores `rir` at its
    NATURAL length (shorter than the recording, reference
    scripts/data/shard_test.py:150-158) — the reader must accept it (the
    round-2 blanket sample-alignment check rejected it) and the mixer must
    consume it end-to-end: build -> read -> pad-to-buffer -> DynamicMixer,
    with the mixed output equal to a direct convolution of the sources."""
    import jax
    import jax.numpy as jnp

    from fastenhancer_tpu.data.shard_mixer import (
        DynamicMixer, batch_convolve_rir)
    from scripts.data.shard_test import main

    sp = _speech_corpus(tmp_path)
    nz = _noise_corpus(tmp_path)
    rd, csv, rir_src = _rir_setup(tmp_path)
    cfg = {
        "fs": SR, "silence_length": 0.1,
        "activity_threshold_relative": -25.0,
        "input": {
            "nearend_speech": {"base_dir": str(sp), "extension": ".wav"},
            "nearend_noise": {"pool": {
                "directories_to_include": [str(nz)], "extension": "",
                "probability": 1.0}},
            "rir": {"pool": {"csv": str(csv), "base_dir": str(rd),
                             "prob": 1.0}},
        },
        "nearend": {"speech_dbFS": [-25.0, -25.0],
                    "noise": {"snr": [10, 10, 1]},
                    "rir": {"prob": 1.0}},
    }
    cfg_path = tmp_path / "se_test.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    main(["-n", "rirset", "-c", str(cfg_path),
          "-s", str(tmp_path / "shards"), "-j", "1"])

    src = ShardSource(str(tmp_path / "shards" / "rirset"),
                      fields=("recording", "rir", "noise"))
    cuts = sorted(src.iter_cuts(seed=0), key=lambda c: int(c.id))
    assert len(cuts) == 3
    assert all(len(c.extras["rir"]) == len(rir_src) != len(c.audio)
               for c in cuts)

    # assemble a batch exactly like ShardDataset does: rir padded into a
    # fixed 0.5 s buffer (shard.py _iter_segment_batches)
    t = min(len(c.audio) for c in cuts)
    t_rir = SR // 2
    b = len(cuts)
    speech = np.stack([c.audio[:t] for c in cuts])[:, None]
    rir = np.zeros((b, 1, t_rir), np.float32)
    onset = np.zeros(b, np.int64)
    t60 = np.zeros(b, np.float32)
    for i, c in enumerate(cuts):
        r = c.extras["rir"][:t_rir]
        rir[i, 0, : len(r)] = r
        onset[i] = c.custom["rir_onset"]
        t60[i] = c.custom["rir_t60"]
    mixer = DynamicMixer(speech_dbFS=(-20.0, -20.0), snr=(40.0, 40.0),
                         sampling_rate=SR, rir_target_type="early_rir")
    out = mixer(jax.random.PRNGKey(0), jnp.asarray(speech),
                speech_clean=jnp.asarray(speech),
                noise=jnp.zeros_like(jnp.asarray(speech)),
                rir=jnp.asarray(rir), rir_onset=jnp.asarray(onset),
                rir_t60=jnp.asarray(t60))
    # the mixed input is the reverberant speech rescaled to -20 dBFS:
    # correlation with the direct convolution must be ~1
    direct = np.asarray(batch_convolve_rir(jnp.asarray(speech),
                                           jnp.asarray(rir)))
    got = np.asarray(out["speech"])
    for i in range(b):
        a, d = got[i, 0], direct[i, 0]
        corr = np.dot(a, d) / (np.linalg.norm(a) * np.linalg.norm(d))
        assert corr > 0.9999


def _aec_setup(tmp_path):
    base = tmp_path / "aec"
    (base / "farend_speech").mkdir(parents=True)
    (base / "echo_signal").mkdir()
    for i in range(2):
        write_wav(str(base / "farend_speech"
                      / f"farend_speech_fileid_{i}.wav"),
                  _tone(1.5, 500 + 100 * i, 0.25), SR)
        write_wav(str(base / "echo_signal" / f"echo_fileid_{i}.wav"),
                  _tone(1.5, 500 + 100 * i, 0.1), SR)
    tsv = tmp_path / "real.tsv"
    tsv.write_text("farend\techo\tncc\n")  # header only: pool empty
    return base, tsv


def test_shard_test_farend(tmp_path):
    from scripts.data.shard_test import main

    sp = _speech_corpus(tmp_path, n=2)
    base, tsv = _aec_setup(tmp_path)
    cfg = {
        "fs": SR, "silence_length": 0.1,
        "activity_threshold_relative": -25.0,
        "input": {
            "nearend_speech": {"base_dir": str(sp), "extension": ".wav"},
            "farend": {
                "aec_challenge_real": [
                    {"base_dir": str(base), "tsv": str(tsv)}],
                "aec_challenge_synthetic": {
                    "base_dir": str(base), "id": {"lower": 0, "upper": 1}},
            },
        },
        "nearend": {"speech_dbFS": [-25.0, -25.0],
                    "noise": {"snr": [0, 0, 1]}},
        "farend": {
            "prob": {"farend_echo": 1.0, "farend_only": 0.0},
            "aec_challenge_real": {"ser": [-10, 10, 5],
                                   "ncc_threshold": 0.5, "prob": 0.0},
            "aec_challenge_synthetic": {"ser": [-10, 10, 5], "prob": 1.0},
        },
    }
    cfg_path = tmp_path / "se_aec.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    main(["-n", "aecset", "-c", str(cfg_path),
          "-s", str(tmp_path / "shards"), "-j", "1"])
    src = ShardSource(str(tmp_path / "shards" / "aecset"),
                      fields=("recording", "farend", "echo"))
    cuts = sorted(src.iter_cuts(seed=0), key=lambda c: int(c.id))
    assert len(cuts) == 2
    for c in cuts:
        assert len(c.extras["farend"]) == len(c.audio)
        assert len(c.extras["echo"]) == len(c.audio)
        assert c.custom["rms_echo"] > 0
        assert c.sup["farend_type"] == "synthetic"
        assert c.sup["return_farend"] is True
        assert c.sup["ser"] in [-10.0, -5.0, 0.0, 5.0, 10.0]

    # farend_only: echo flagged absent -> ser omitted (inf is not strict
    # JSON; the reference stores float('inf'), shard_test.py:190)
    cfg["farend"]["prob"] = {"farend_echo": 0.0, "farend_only": 1.0}
    cfg_path.write_text(yaml.dump(cfg))
    main(["-n", "aecset", "-c", str(cfg_path),
          "-s", str(tmp_path / "shards"), "-j", "1", "-f"])
    for c in src.iter_cuts(seed=0):
        assert "ser" not in c.sup
        assert c.sup["return_farend"] is True


def test_float32_wav_riff_size_is_spec_valid(tmp_path):
    """The hand-rolled float32 encoder must write a RIFF size covering the
    data chunk header: file size == 8 + declared RIFF size (strict parsers
    bound their reads by it)."""
    import struct

    from scripts.data.shar_writer import wav_bytes
    from scripts.data.segment_vad import write_wav_any
    from fastenhancer_tpu.data.audio_io import read_wav

    x = np.linspace(-0.9, 0.9, 1001).astype(np.float32)
    blob = wav_bytes(x, SR, float32=True)
    riff_size = struct.unpack("<I", blob[4:8])[0]
    assert len(blob) == 8 + riff_size, (len(blob), riff_size)

    path = str(tmp_path / "f32.wav")
    write_wav_any(path, x, SR, subtype="float32")
    raw = open(path, "rb").read()
    assert raw == blob  # one shared encoder, byte-identical output
    y, sr = read_wav(path)
    assert sr == SR
    np.testing.assert_allclose(y, x, atol=0)


def test_directories_two_tsvs_same_dir_and_exclude(tmp_path):
    """Two .tsv filelists in one directory keep distinct pools (keyed by
    the entry, not its parent dir), and files_to_exclude filters tsv
    entries too."""
    from scripts.data.corpus_utils import Directories

    root = tmp_path / "noise"
    (root / "keep").mkdir(parents=True)
    for i in range(4):
        write_wav(str(root / "keep" / f"n{i}.wav"), _noise(0.2, i), SR)
    a = root / "a.tsv"
    b = root / "b.tsv"
    a.write_text("keep/n0.wav\nkeep/n1.wav\n")
    b.write_text("keep/n2.wav\nkeep/n3.wav\n")
    d = Directories([str(a), str(b)], extension="")
    assert len(d) == 4
    random.seed(0)
    drawn = {os.path.basename(d.choice()) for _ in range(60)}
    assert drawn == {"n0.wav", "n1.wav", "n2.wav", "n3.wav"}

    d2 = Directories([str(a), str(b)], extension="",
                     files_to_exclude=[str(root / "keep" / "n1.wav"),
                                       str(root / "keep" / "n2.wav")])
    assert len(d2) == 2
    drawn = {os.path.basename(d2.choice()) for _ in range(40)}
    assert drawn == {"n0.wav", "n3.wav"}


def test_shard_test_multijob_deterministic(tmp_path):
    """--seed S regenerates bit-identical shards whatever -j is: every cut
    reseeds from (seed, index), so worker scheduling cannot matter."""
    from fastenhancer_tpu.data.shard import ShardSource
    from scripts.data.shard_test import main

    sp = _speech_corpus(tmp_path)
    nz = _noise_corpus(tmp_path)
    cfg = {
        "fs": SR, "silence_length": 0.1,
        "activity_threshold_relative": -25.0,
        "input": {
            "nearend_speech": {"base_dir": str(sp), "extension": ".wav"},
            "nearend_noise": {"pool": {
                "directories_to_include": [str(nz)], "extension": "",
                "probability": 1.0}},
        },
        "nearend": {"speech_dbFS": [-30.0, -15.0],
                    "noise": {"snr": [-5, 15, 5]}},
    }
    cfg_path = tmp_path / "se_test.yaml"
    cfg_path.write_text(yaml.dump(cfg))

    sets = []
    for run, jobs in (("j1", "1"), ("j2", "2"), ("j1b", "1")):
        main(["-n", run, "-c", str(cfg_path), "--seed", "11",
              "-s", str(tmp_path / "shards"), "-j", jobs])
        src = ShardSource(str(tmp_path / "shards" / run),
                          fields=("recording", "noise"))
        sets.append(sorted(src.iter_cuts(seed=0), key=lambda c: int(c.id)))
    for other in sets[1:]:
        for c0, c1 in zip(sets[0], other):
            assert c0.sup["snr"] == c1.sup["snr"]
            assert c0.sup["dbFS"] == pytest.approx(c1.sup["dbFS"])
            np.testing.assert_array_equal(c0.extras["noise"],
                                          c1.extras["noise"])


def test_vad_segments_silent_recording():
    """A recording with no frame above the absolute activity floor yields
    no segments (ref=0 used to mark the whole noise floor as speech)."""
    from scripts.audiolib import vad_segments

    rng = np.random.default_rng(0)
    silent = (rng.standard_normal(SR * 2) * 1e-5).astype(np.float32)
    assert vad_segments(silent, SR) == []
