"""Corpus segmentation adapters (scripts/data/segment_{vad,daps,ears}.py).

The reference cuts long studio recordings into utterance chunks with an
energy VAD (reference: scripts/data/segment_daps.py:40-101,
segment_ears.py:27-103). These tests synthesize speech/silence layouts and
assert the chunking contract (onset skip, min/max-dur cut at first silence,
end padding, short-tail drop, EARS high-pass + float32 output) and both
CLIs end to end.
"""
import glob
import os

import numpy as np

from fastenhancer_tpu.data.audio_io import read_wav, write_wav

from scripts.data.segment_vad import segment_chunks, write_wav_any

SR = 16000


def _speech(seconds, amp=0.3, freq=1000.0):
    t = np.arange(int(seconds * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _silence(seconds):
    return np.zeros(int(seconds * SR), np.float32)


def test_segment_chunks_cuts_at_silence():
    # 4 s speech | 2 s silence | 4 s speech | 0.5 s silence tail
    audio = np.concatenate([_speech(4), _silence(2), _speech(4),
                            _silence(0.5)])
    chunks = segment_chunks(audio, SR, min_dur=3.0, max_dur=10.0)
    assert len(chunks) == 2
    # first chunk: speech burst + up to pad_ms of following silence
    assert 4.0 * SR <= len(chunks[0]) <= 4.3 * SR
    # second chunk: pad before onset + burst + short tail
    assert 4.5 * SR <= len(chunks[1]) <= 4.9 * SR
    # cut content is preserved verbatim (chunks are slices of the input)
    assert np.array_equal(chunks[0][: 4 * SR], audio[: 4 * SR])


def test_segment_chunks_min_dur_blocks_early_cut():
    # the 0.5 s gap at 1 s must not cut (before min_dur); the 1 s gap at
    # 3.5 s is the first silence inside [min_dur, max_dur] and wins
    audio = np.concatenate([_speech(1), _silence(0.5), _speech(2),
                            _silence(1.0), _speech(4)])
    chunks = segment_chunks(audio, SR, min_dur=3.0, max_dur=6.0)
    assert len(chunks) == 2
    assert 3.5 * SR <= len(chunks[0]) <= 3.8 * SR  # cut at 3.5 s + pad


def test_segment_chunks_force_cut_at_max_dur():
    audio = _speech(12)  # no silence at all
    chunks = segment_chunks(audio, SR, min_dur=3.0, max_dur=5.0,
                            tail_min=1.0)
    assert all(len(c) <= 5.3 * SR for c in chunks)
    assert sum(len(c) for c in chunks) == len(audio)  # nothing dropped


def test_segment_chunks_drops_short_tail():
    assert segment_chunks(_speech(0.5), SR, tail_min=1.0) == []
    # a tail under tail_min after the last cut is discarded too
    audio = np.concatenate([_speech(4), _silence(2), _speech(0.3)])
    chunks = segment_chunks(audio, SR, min_dur=3.0, max_dur=5.0,
                            tail_min=1.0)
    assert len(chunks) == 1


def test_segment_chunks_highpass_ignores_rumble():
    # 30 Hz rumble everywhere + a 1 kHz burst at 3..7 s: without the
    # high-pass every frame is active; with it the onset is the burst
    # (reference: segment_ears.py:41-44 uses 80 Hz for exactly this).
    t = np.arange(10 * SR) / SR
    rumble = (0.2 * np.sin(2 * np.pi * 10.0 * t)).astype(np.float32)
    audio = rumble.copy()
    audio[3 * SR: 7 * SR] += _speech(4)
    no_hp = segment_chunks(audio, SR, min_dur=3.0, max_dur=12.0)
    hp = segment_chunks(audio, SR, min_dur=3.0, max_dur=12.0,
                        highpass_hz=80.0)
    assert len(no_hp) == 1 and len(no_hp[0]) == len(audio)
    assert len(hp) == 1 and len(hp[0]) <= 7.3 * SR  # onset-trimmed


def test_write_wav_any_float32_roundtrip(tmp_path):
    x = (np.sin(np.linspace(0, 40, SR)) * 0.7).astype(np.float32)
    p = str(tmp_path / "f32.wav")
    write_wav_any(p, x, SR, subtype="float32")
    y, sr = read_wav(p)
    assert sr == SR
    np.testing.assert_array_equal(y, x)  # float stays bit-exact
    p16 = str(tmp_path / "p16.wav")
    write_wav_any(p16, x, SR, subtype="pcm16")
    y16, _ = read_wav(p16)
    assert np.abs(y16 - x).max() < 1 / 32000


def test_segment_daps_cli(tmp_path, capsys):
    from scripts.data.segment_daps import main

    src = tmp_path / "produced"
    src.mkdir()
    audio = np.concatenate([_speech(4), _silence(2), _speech(5)])
    write_wav(str(src / "f1_script1_studio.wav"), audio, SR)
    write_wav(str(src / "f2_script1_studio.wav"), _speech(3.5), SR)
    out = tmp_path / "seg"
    main(["--src-dir", str(src), "--out-dir", str(out),
          "--num-workers", "1"])
    files = sorted(os.listdir(out))
    assert files == ["f1_script1_studio_0000.wav",
                     "f1_script1_studio_0001.wav",
                     "f2_script1_studio_0000.wav"]
    y, sr = read_wav(str(out / files[2]))
    assert sr == SR and len(y) == int(3.5 * SR)  # pcm16, single chunk
    assert "3 segments" in capsys.readouterr().out


def test_segment_ears_cli_preserves_dirs_and_float(tmp_path, capsys):
    from scripts.data.segment_ears import main

    src = tmp_path / "ears"
    for spk in ("p001", "p002"):
        (src / spk).mkdir(parents=True)
        write_wav(str(src / spk / "emo_adoration.wav"), _speech(3.5), SR)
    out = tmp_path / "seg"
    main(["--src-dir", str(src), "--out-dir", str(out),
          "--num-workers", "1"])
    got = sorted(glob.glob(str(out / "**" / "*.wav"), recursive=True))
    assert [os.path.relpath(g, out) for g in got] == [
        "p001/emo_adoration_0000.wav", "p002/emo_adoration_0000.wav"]
    y, _ = read_wav(got[0])
    # float32 output: bit-exact vs what the (pcm16) source decodes to
    src_audio, _ = read_wav(str(src / "p001" / "emo_adoration.wav"))
    np.testing.assert_array_equal(y, src_audio)


def test_segment_dry_run_writes_nothing(tmp_path, capsys):
    from scripts.data.segment_daps import main

    src = tmp_path / "produced"
    src.mkdir()
    write_wav(str(src / "a.wav"), _speech(2), SR)
    out = tmp_path / "seg"
    main(["--src-dir", str(src), "--out-dir", str(out), "--dry-run"])
    assert not out.exists()
    assert "a.wav" in capsys.readouterr().out
