"""Audio file IO without librosa/soundfile: stdlib `wave` + numpy.

The reference reads via librosa (reference: utils/data/noise_suppression.py:
150-160) which isn't in this environment. PCM 16/24/32-bit and IEEE-float
wavs are decoded to float32 in [-1, 1]; resampling is polyphase
(scipy.signal.resample_poly), matching the quality class of the reference's
scripts/resample.py pipeline.
"""
from __future__ import annotations

import struct
import typing as tp
import wave

import numpy as np


def read_wav(path: str, sr: tp.Optional[int] = None,
             mono: bool = True) -> tp.Tuple[np.ndarray, int]:
    """Read a wav file -> (float32 [-1,1], sample_rate).

    mono=True (default) averages multi-channel audio to mono
    (librosa.load default behavior) and returns [T]; mono=False keeps
    channels and returns [C, T] (the noise shard builders chunk per
    channel, reference: scripts/data/shard_noise.py:85-101). If `sr` is
    given and differs from the file rate, resample (along time).
    """
    from .. import native

    if mono and native.available():  # native core decodes straight to mono
        x, file_sr = native.read_wav_file(path)
    else:
        with open(path, "rb") as fh:
            header = fh.read(12)
            if header[:4] == b"RIFF" and header[8:12] == b"WAVE":
                x, file_sr = _read_riff(fh)
            else:
                raise ValueError(f"not a RIFF/WAVE file: {path}")
    if x.ndim == 2:
        x = x.mean(axis=1) if mono else np.ascontiguousarray(x.T)
    if sr is not None and sr != file_sr:
        x = resample(x, file_sr, sr)
        file_sr = sr
    return x, file_sr


def _read_riff(fh) -> tp.Tuple[np.ndarray, int]:
    """Parse fmt/data chunks; supports PCM (1), IEEE float (3), extensible."""
    fmt = None
    data = None
    while True:
        head = fh.read(8)
        if len(head) < 8:
            break
        cid, size = struct.unpack("<4sI", head)
        if cid == b"fmt ":
            fmt = fh.read(size)
        elif cid == b"data":
            data = fh.read(size)
        else:
            fh.seek(size + (size & 1), 1)
        if fmt is not None and data is not None:
            break
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, sr, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real format in GUID
        audio_fmt = struct.unpack("<H", fmt[24:26])[0]
    if audio_fmt == 3:  # IEEE float
        x = np.frombuffer(data, np.float32 if bits == 32 else np.float64)
        x = x.astype(np.float32)
    elif audio_fmt == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8).reshape(-1, 3)
            ints = (raw[:, 0].astype(np.int32)
                    | (raw[:, 1].astype(np.int32) << 8)
                    | (raw[:, 2].astype(np.int32) << 16))
            ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
            x = ints.astype(np.float32) / float(1 << 23)
        elif bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bit depth: {bits}")
    else:
        raise ValueError(f"unsupported wav format code: {audio_fmt}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch)
    return x, sr


def read_audio(path: str, sr: tp.Optional[int] = None,
               mono: bool = True) -> tp.Tuple[np.ndarray, int]:
    """read_wav for .wav paths; anything else (flac/mp3/...) decodes via
    soundfile when installed (the reference reads every format through
    librosa; HiFi-TTS ships flac, reference: scripts/data/shard_hifitts1.py)."""
    if path.lower().endswith(".wav"):
        return read_wav(path, sr=sr, mono=mono)
    try:
        import soundfile as sf
    except ImportError as e:
        raise ImportError(
            f"decoding {path.rsplit('.', 1)[-1]} files needs the soundfile "
            f"package (not in this environment)") from e
    x, file_sr = sf.read(path, dtype="float32")
    if x.ndim == 2:
        x = x.mean(axis=1) if mono else np.ascontiguousarray(x.T)
    if sr is not None and sr != file_sr:
        x = resample(x, file_sr, sr)
        file_sr = sr
    return x, file_sr


def write_wav(path: str, x: np.ndarray, sr: int) -> None:
    """Write float [-1,1] mono/stereo as PCM16."""
    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(x * 32768.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(x.shape[1])
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def wav_duration(path: str) -> float:
    """Duration in seconds from the header only (fast length probing,
    reference: utils/data/noise_suppression.py:117-119)."""
    with wave.open(path, "rb") as f:
        return f.getnframes() / f.getframerate()


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr_in, sr_out)
    return resample_poly(x, sr_out // g, sr_in // g, axis=-1
                         ).astype(np.float32)
