"""Native C++ host-IO core: build, decode equality vs the numpy path, and
the shard-walker integration (fastenhancer_tpu/native)."""
import io
import os
import struct
import subprocess
import sys
import tarfile
import wave

import numpy as np
import pytest

from fastenhancer_tpu import native
from fastenhancer_tpu.data.audio_io import _read_riff, write_wav

SR = 16000


def _wav_bytes(x: np.ndarray, fmt: str, sr: int = SR) -> bytes:
    """Serialize [T] or [T, C] float in [-1,1] as a RIFF/WAVE of `fmt`."""
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    if fmt == "pcm16":
        payload = np.clip(x * 32768.0, -32768, 32767).astype("<i2").tobytes()
        code, bits = 1, 16
    elif fmt == "pcm32":
        payload = (np.clip(x, -1, 1) * 2147483000).astype("<i4").tobytes()
        code, bits = 1, 32
    elif fmt == "pcm24":
        ints = np.clip(x * 8388608.0, -8388608, 8388607).astype(np.int32)
        b = np.zeros((ints.size, 3), np.uint8)
        flat = ints.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        payload = b.tobytes()
        code, bits = 1, 24
    elif fmt == "pcm8":
        payload = (np.clip(x, -1, 1) * 128 + 128).clip(0, 255).astype(
            np.uint8).tobytes()
        code, bits = 1, 8
    elif fmt == "f32":
        payload = x.astype("<f4").tobytes()
        code, bits = 3, 32
    elif fmt == "f64":
        payload = x.astype("<f8").tobytes()
        code, bits = 3, 64
    else:
        raise ValueError(fmt)
    block = n_ch * bits // 8
    fmt_chunk = struct.pack("<HHIIHH", code, n_ch, sr, sr * block, block, bits)
    # include an odd-sized junk chunk before data to exercise padding skip
    junk = b"JUNKdata!"[: 5]
    chunks = (b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
              + b"junk" + struct.pack("<I", len(junk)) + junk + b"\0"
              + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")
    return True


FORMATS = ["pcm16", "pcm32", "pcm24", "pcm8", "f32", "f64"]


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("n_ch", [1, 2])
def test_read_wav_file_matches_numpy(lib_ok, tmp_path, fmt, n_ch):
    rng = np.random.default_rng(hash((fmt, n_ch)) % 2**31)
    x = (rng.standard_normal((1000, n_ch)).astype(np.float32) * 0.4).squeeze()
    raw = _wav_bytes(x, fmt)
    p = tmp_path / f"{fmt}_{n_ch}.wav"
    p.write_bytes(raw)

    got, sr = native.read_wav_file(str(p))
    ref, ref_sr = _read_riff(io.BytesIO(raw[12:]))
    if ref.ndim == 2:
        ref = ref.mean(axis=1)
    ref = ref.astype(np.float32)
    assert sr == ref_sr == SR
    assert got.dtype == np.float32 and got.shape == ref.shape
    if n_ch == 1:
        np.testing.assert_array_equal(got, ref)  # bit-identical mono
    else:
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_read_wav_file_errors(lib_ok, tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"RIFFxxxxWAVEjunk")
    with pytest.raises(ValueError):
        native.read_wav_file(str(p))
    with pytest.raises(OSError):
        native.read_wav_file(str(tmp_path / "missing.wav"))


def test_read_wav_buffer_growth(lib_ok, tmp_path):
    """Files larger than the initial 1M-float buffer take the -2 retry."""
    x = np.linspace(-0.5, 0.5, (1 << 20) + 4321).astype(np.float32)
    p = tmp_path / "big.wav"
    write_wav(str(p), x, SR)
    got, sr = native.read_wav_file(str(p))
    assert sr == SR and got.size == x.size
    np.testing.assert_allclose(got, x, atol=1.0 / 32768)


def test_shard_members_matches_tarfile(lib_ok, tmp_path):
    """Native walk+decode ≡ stdlib tarfile + numpy decode, including a
    non-wav member passed through as raw bytes."""
    tar_path = tmp_path / "recording.000000.tar"
    rng = np.random.default_rng(0)
    entries = []
    with tarfile.open(tar_path, "w", format=tarfile.USTAR_FORMAT) as tar:
        for i, fmt in enumerate(["pcm16", "pcm16", "f32", "pcm24"]):
            x = rng.standard_normal(800 + 100 * i).astype(np.float32) * 0.3
            raw = _wav_bytes(x, fmt)
            info = tarfile.TarInfo(f"cut_{i:04d}.wav")
            info.size = len(raw)
            tar.addfile(info, io.BytesIO(raw))
            entries.append((f"cut_{i:04d}.wav", raw))
        blob = b"\x01\x02zz" * 33
        info = tarfile.TarInfo("meta_0000.bin")
        info.size = len(blob)
        tar.addfile(info, io.BytesIO(blob))
        entries.append(("meta_0000.bin", blob))

    got = list(native.shard_members(str(tar_path)))
    assert [n for n, _ in got] == [n for n, _ in entries]
    for (name, item), (_, raw) in zip(got, entries):
        if name.endswith(".wav"):
            ref, _ = _read_riff(io.BytesIO(raw[12:]))
            ref = ref.astype(np.float32)
            np.testing.assert_array_equal(item, ref)
        else:
            assert item == raw


def test_shard_members_buffer_growth_and_order(lib_ok, tmp_path):
    """A member bigger than the walk buffer triggers the grow-retry without
    skipping or duplicating members."""
    tar_path = tmp_path / "recording.000000.tar"
    small = np.ones(100, np.float32) * 0.1
    big = np.full(5000, -0.25, np.float32)
    with tarfile.open(tar_path, "w", format=tarfile.USTAR_FORMAT) as tar:
        for name, x in [("a.wav", small), ("b.wav", big), ("c.wav", small)]:
            raw = _wav_bytes(x, "pcm16")
            info = tarfile.TarInfo(name)
            info.size = len(raw)
            tar.addfile(info, io.BytesIO(raw))
    got = list(native.shard_members(str(tar_path), buf_floats=256))
    assert [n for n, _ in got] == ["a.wav", "b.wav", "c.wav"]
    assert [len(a) for _, a in got] == [100, 5000, 100]
    np.testing.assert_allclose(got[1][1], big, atol=1.0 / 32768)


def test_shard_source_uses_native(lib_ok, tmp_path):
    """ShardSource._iter_tar_audio output is identical with the native core
    enabled vs disabled (the walker it feeds is unchanged)."""
    from fastenhancer_tpu.data.shard import ShardSource

    tar_path = tmp_path / "recording.000000.tar"
    rng = np.random.default_rng(1)
    with tarfile.open(tar_path, "w", format=tarfile.USTAR_FORMAT) as tar:
        for i in range(5):
            x = rng.standard_normal(640).astype(np.float32) * 0.3
            raw = _wav_bytes(x, "pcm16")
            info = tarfile.TarInfo(f"s_{i}.wav")
            info.size = len(raw)
            tar.addfile(info, io.BytesIO(raw))
    with_native = list(ShardSource._iter_tar_audio(str(tar_path)))
    try:
        native._LIB_SAVE = native._LIB
        native._LIB = None
        native._TRIED = True  # force unavailable -> python fast walker
        without = list(ShardSource._iter_tar_audio(str(tar_path)))
    finally:
        native._LIB = native._LIB_SAVE
        del native._LIB_SAVE
    assert [s for s, _ in with_native] == [s for s, _ in without]
    for (_, a), (_, b) in zip(with_native, without):
        np.testing.assert_array_equal(a, b)


def test_fe_native_disabled_env(tmp_path):
    """FE_NATIVE=0 must cleanly disable the native path (fresh process —
    availability is cached per process)."""
    code = ("import fastenhancer_tpu.native as n; "
            "assert not n.available(); print('ok')")
    env = dict(os.environ, FE_NATIVE="0", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert out.returncode == 0 and "ok" in out.stdout, out.stderr
