"""Mel visualization helper (reference: functional/audio_functional.py:55-67).

Used only for TensorBoard spectrogram images; the slaney/htk filterbank is
shared with the dprnn model's mel init.
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=8)
def _mel_fbank(n_freq: int, n_mels: int, sr: int) -> np.ndarray:
    from ..models.fastenhancer.dprnn import mel_fbank_weights

    pre, _ = mel_fbank_weights(n_freq, n_mels, sr)
    return pre  # [n_mels, n_freq]


def spec_to_mel(mag: np.ndarray, n_mels: int = 80, sr: int = 16_000,
                eps: float = 1e-5) -> np.ndarray:
    """magnitude [F, T] -> log-mel [n_mels, T] (numpy, host side)."""
    fb = _mel_fbank(mag.shape[0], n_mels, sr)
    return np.log10(fb @ np.asarray(mag) + eps)
