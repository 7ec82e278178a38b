"""STFT / iSTFT front-end for TPU-native speech enhancement.

Re-designed (not translated) from the reference's torch front-end
(reference: functional/audio_modules.py:9-303). Three forms are provided:

* Offline batch STFT/iSTFT over whole utterances (`stft` / `istft`) used for
  training. The DFT can run either through XLA's FFT (``method="fft"``) or as
  one windowed-DFT matmul (``method="matmul"``) which maps directly onto the
  TPU MXU (reference analog: models/fastenhancer/conv_stft/model.py:55-117).
* Magnitude-compressed wrappers (`compress` / `uncompress`,
  reference: functional/audio_modules.py:124-164).
* Streaming single-hop transforms with explicit rolling carries
  (`stft_streaming_step` / `istft_streaming_step`) whose carry pytree replaces
  the reference's ONNX cache tensors (reference: functional/audio_modules.py:238-303).

All functions are pure and jit-safe; shapes are static.
"""
from __future__ import annotations

import dataclasses
import functools
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# The DFT matmuls are numerical front-end math: always run them in full f32
# (on TPU the default f32-matmul path is bf16x3/bf16 which costs ~1e-2 error
# on a 512-point DFT — too coarse for PESQ-level waveform parity).
_HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

def make_window(win_type: tp.Optional[str], win_size: int) -> np.ndarray:
    """Create an analysis window (numpy, float64 internally for accuracy).

    Supported: None (rect), "hann" (periodic, torch.hann_window default),
    "povey" (hann(sym)^0.85), "hann-sqrt" (hann(sym)^0.5), "hamming", "blackman".
    Reference: functional/audio_modules.py:44-64.
    """
    n = np.arange(win_size, dtype=np.float64)
    if win_type is None:
        w = np.ones(win_size, dtype=np.float64)
    elif win_type == "hann":
        # periodic hann, matches torch.hann_window(win_size)
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)
    elif win_type == "povey":
        sym = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (win_size - 1))
        w = sym ** 0.85
    elif win_type == "hann-sqrt":
        sym = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (win_size - 1))
        w = np.sqrt(sym)
    elif win_type == "hamming":
        w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / win_size)
    elif win_type == "blackman":
        x = 2.0 * np.pi * n / win_size
        w = 0.42 - 0.5 * np.cos(x) + 0.08 * np.cos(2 * x)
    else:
        raise ValueError(f"unsupported window type: {win_type}")
    return w.astype(np.float64)


def padded_window(win_type: tp.Optional[str], win_size: int, n_fft: int) -> np.ndarray:
    """Window zero-padded symmetrically to n_fft (torch.stft convention)."""
    w = make_window(win_type, win_size)
    if win_size < n_fft:
        pad = n_fft - win_size
        w = np.pad(w, (pad // 2, pad - pad // 2))
    elif win_size > n_fft:
        raise ValueError(f"win_size({win_size}) > n_fft({n_fft})")
    return w


def ola_window_sq_sum(window: np.ndarray, hop: int) -> np.ndarray:
    """Steady-state overlap-added window-square sum over one frame.

    win_sq_sum[i] = sum_k window[i + k*hop]^2 over all integer k keeping the
    index in range: the periodic denominator of OLA synthesis.
    Reference math: functional/audio_modules.py:221-236 (F.fold trick).
    """
    n_fft = window.shape[0]
    wsq = window.astype(np.float64) ** 2
    out = np.zeros(n_fft, dtype=np.float64)
    k_max = (n_fft + hop - 1) // hop
    for k in range(-k_max, k_max + 1):
        shift = k * hop
        lo = max(0, -shift)
        hi = min(n_fft, n_fft - shift)
        if lo < hi:
            out[lo:hi] += wsq[lo + shift: hi + shift]
    return out


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class STFTConfig:
    """Static STFT configuration. Hashable so it can be a jit static arg."""
    n_fft: int
    hop_size: int
    win_size: tp.Optional[int] = None
    win_type: tp.Optional[str] = "hann"
    center: bool = True
    pad_mode: str = "reflect"
    normalized: bool = False
    method: str = "fft"  # "fft" | "matmul"

    def __post_init__(self):
        if self.win_size is None:
            object.__setattr__(self, "win_size", self.n_fft)
        assert self.n_fft >= self.win_size

    @property
    def n_freq(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def cache_len(self) -> int:
        return self.n_fft - self.hop_size

    @functools.cached_property
    def window(self) -> np.ndarray:
        return padded_window(self.win_type, self.win_size, self.n_fft)

    @functools.cached_property
    def window_f32(self) -> np.ndarray:
        return self.window.astype(np.float32)

    @functools.cached_property
    def synthesis_window(self) -> np.ndarray:
        """window / OLA(window^2): steady-state per-frame synthesis window."""
        return (self.window / ola_window_sq_sum(self.window, self.hop_size)).astype(
            np.float32
        )

    @functools.cached_property
    def dft_matrix(self) -> np.ndarray:
        """Windowed forward DFT as a matmul: [n_fft, 2*n_freq] (re then im).

        frame @ dft_matrix == concat(Re(rfft(frame*w)), Im(rfft(frame*w))).
        """
        n = np.arange(self.n_fft, dtype=np.float64)[:, None]
        k = np.arange(self.n_freq, dtype=np.float64)[None, :]
        ang = -2.0 * np.pi / self.n_fft * n * k
        m = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)
        m = self.window[:, None] * m
        if self.normalized:
            m = m / math.sqrt(self.n_fft)
        return m.astype(np.float32)

    @functools.cached_property
    def idft_matrix(self) -> np.ndarray:
        """Inverse DFT as a matmul: [2*n_freq, n_fft] (re rows then im rows).

        For a conjugate-symmetric spectrum X (from a real frame),
        concat(Re X, Im X) @ idft_matrix == irfft(X) * n_fft ... scaled so the
        result is exactly irfft(X). Interior bins are double-counted relative
        to the full DFT sum, so they carry weight 2; bins 0 and n_fft/2 weight 1.
        """
        k = np.arange(self.n_freq, dtype=np.float64)[:, None]
        n = np.arange(self.n_fft, dtype=np.float64)[None, :]
        ang = 2.0 * np.pi / self.n_fft * k * n
        scale = np.full((self.n_freq, 1), 2.0 / self.n_fft)
        scale[0] = 1.0 / self.n_fft
        scale[-1] = 1.0 / self.n_fft
        re = scale * np.cos(ang)
        im = -scale * np.sin(ang)  # X k-th bin: Re cos - Im sin contribution
        m = np.concatenate([re, im], axis=0)
        if self.normalized:
            m = m * math.sqrt(self.n_fft)
        return m.astype(np.float32)


# ---------------------------------------------------------------------------
# Framing / overlap-add
# ---------------------------------------------------------------------------

def frame_signal(x: Array, n_fft: int, hop: int) -> Array:
    """[B, L] -> [B, T, n_fft] frames at stride `hop` (no padding).

    When hop divides n_fft this compiles to pure reshapes + K static slices
    (cheap on TPU); otherwise it falls back to a gather.
    """
    b, length = x.shape
    n_frames = (length - n_fft) // hop + 1
    if n_fft % hop == 0:
        k = n_fft // hop
        xr = x[:, : (length // hop) * hop].reshape(b, length // hop, hop)
        parts = [xr[:, i: i + n_frames] for i in range(k)]
        return jnp.concatenate(parts, axis=2)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[:, idx]


def overlap_add(frames: Array, hop: int) -> Array:
    """[B, T, n_fft] -> [B, (T-1)*hop + n_fft] overlap-add at stride `hop`.

    Fast path (hop | n_fft): decompose each frame into K hop-chunks and add K
    shifted reshapes — no scatter. General path: scatter-add.
    """
    b, t, n_fft = frames.shape
    out_len = (t - 1) * hop + n_fft
    if n_fft % hop == 0:
        k = n_fft // hop
        chunks = frames.reshape(b, t, k, hop)
        out = jnp.zeros((b, t + k - 1, hop), frames.dtype)
        for i in range(k):
            out = out.at[:, i: i + t].add(chunks[:, :, i])
        return out.reshape(b, (t + k - 1) * hop)[:, :out_len]
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    out = jnp.zeros((b, out_len), frames.dtype)
    return out.at[:, idx].add(frames)


# ---------------------------------------------------------------------------
# Offline STFT / iSTFT
# ---------------------------------------------------------------------------

def _center_pad(x: Array, pad: int, mode: str) -> Array:
    if mode == "reflect":
        return jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    if mode == "constant":
        return jnp.pad(x, ((0, 0), (pad, pad)))
    raise ValueError(f"unsupported pad_mode {mode}")


def stft(x: Array, cfg: STFTConfig) -> Array:
    """Batch STFT. x: [B, L] (or [B, 1, L]) -> [B, n_freq, T, 2].

    Matches torch.stft(center=cfg.center, pad_mode=cfg.pad_mode, onesided).
    Reference: functional/audio_modules.py:70-90.
    """
    if x.ndim == 3:
        x = x.squeeze(1)
    in_dtype = x.dtype
    x = x.astype(jnp.float32)  # DSP front-end always runs f32 (bf16-safe)
    if cfg.center:
        x = _center_pad(x, cfg.n_fft // 2, cfg.pad_mode)
    frames = frame_signal(x, cfg.n_fft, cfg.hop_size)  # [B, T, n_fft]
    if cfg.method == "matmul":
        dft = jnp.asarray(cfg.dft_matrix)
        spec = jnp.matmul(frames, dft, precision=_HIGHEST)  # [B, T, 2*n_freq]
        re, im = jnp.split(spec, 2, axis=-1)
    else:
        frames = frames * jnp.asarray(cfg.window_f32)
        z = jnp.fft.rfft(frames, axis=-1)  # [B, T, n_freq]
        re, im = jnp.real(z), jnp.imag(z)
        if cfg.normalized:
            scale = 1.0 / math.sqrt(cfg.n_fft)
            re, im = re * scale, im * scale
    out = jnp.stack([re, im], axis=-1)  # [B, T, n_freq, 2]
    out = jnp.swapaxes(out, 1, 2)  # [B, n_freq, T, 2]
    if cfg.hop_size % 2 == 1:  # torch front-end clips last frame for odd hop
        out = out[:, :, :-1]
    return out.astype(in_dtype)


def istft(spec: Array, cfg: STFTConfig, length: tp.Optional[int] = None) -> Array:
    """Batch inverse STFT. spec: [B, n_freq, T, 2] -> [B, L].

    Matches torch.istft(center=True): OLA(irfft(X)*w) / OLA(w^2), trimmed by
    n_fft//2 on each side. Reference: functional/audio_modules.py:92-121.
    """
    assert cfg.center, "istft currently requires center=True (parity w/ reference)"
    in_dtype = spec.dtype
    spec = spec.astype(jnp.float32)  # DSP front-end always runs f32
    re = spec[..., 0].swapaxes(1, 2)  # [B, T, n_freq]
    im = spec[..., 1].swapaxes(1, 2)
    if cfg.method == "matmul":
        idft = jnp.asarray(cfg.idft_matrix)
        frames = jnp.matmul(
            jnp.concatenate([re, im], axis=-1), idft, precision=_HIGHEST
        )  # [B, T, n_fft]
        if cfg.normalized:
            pass  # folded into idft_matrix
    else:
        z = jax.lax.complex(re, im)
        frames = jnp.fft.irfft(z, n=cfg.n_fft, axis=-1)
        if cfg.normalized:
            frames = frames * math.sqrt(cfg.n_fft)
    window = jnp.asarray(cfg.window_f32)
    frames = frames * window
    y = overlap_add(frames, cfg.hop_size)  # [B, L_full]

    t = frames.shape[1]
    out_len = (t - 1) * cfg.hop_size + cfg.n_fft
    wsq_frames = jnp.broadcast_to(window * window, (1, t, cfg.n_fft))
    denom = overlap_add(wsq_frames, cfg.hop_size)[0]
    denom = jnp.where(denom > 1e-11, denom, 1.0)
    y = y / denom

    half = cfg.n_fft // 2
    y = y[:, half: out_len - half]
    if length is not None:
        y = y[:, :length]
    return y.astype(in_dtype)


# ---------------------------------------------------------------------------
# Magnitude compression (reference: functional/audio_modules.py:124-164)
# ---------------------------------------------------------------------------

def compress(spec: Array, compression: float, eps: float = 1.0e-5) -> Array:
    """x * |x|^(c-1) on [..., 2] real/imag pairs.

    The eps clamp happens INSIDE the sqrt (power domain): forward-identical
    to the reference's clamp(|x|, min=eps), but sqrt'(0)=inf never enters the
    backward graph (exactly-zero bins appear whenever batches are zero-padded).
    """
    if compression == 1.0:
        return spec
    power = jnp.sum(jnp.square(spec), axis=-1, keepdims=True)
    mag = jnp.sqrt(jnp.maximum(power, eps * eps))
    return spec * jnp.power(mag, compression - 1.0)


def uncompress(spec: Array, compression: float) -> Array:
    """Inverse of `compress`. The reference applies no clamp here; the tiny
    floor below only guards the sqrt gradient at exactly 0 (forward change
    ~1e-19, far below float32 noise)."""
    if compression == 1.0:
        return spec
    power = jnp.sum(jnp.square(spec), axis=-1, keepdims=True)
    # floor must be a NORMAL float32 (subnormals flush to zero -> inf grads)
    mag = jnp.sqrt(jnp.maximum(power, 1e-30))
    return spec * jnp.power(mag, 1.0 / compression - 1.0)


def compressed_stft(
    x: Array,
    cfg: STFTConfig,
    compression: float,
    discard_last_freq_bin: bool = False,
    eps: float = 1.0e-5,
) -> Array:
    """STFT -> optional last-bin drop -> magnitude compression.

    Training front-end of every model (reference: functional/audio_modules.py:145-154).
    """
    spec = stft(x, cfg)
    if discard_last_freq_bin:
        spec = spec[:, :-1]
    return compress(spec, compression, eps)


def compressed_istft(
    spec: Array,
    cfg: STFTConfig,
    compression: float,
    discard_last_freq_bin: bool = False,
    length: tp.Optional[int] = None,
) -> Array:
    """Uncompress -> re-append last bin (zeros) -> iSTFT.

    Reference: functional/audio_modules.py:156-164.
    """
    spec = uncompress(spec, compression)
    if discard_last_freq_bin:
        pad = jnp.zeros_like(spec[:, :1])
        spec = jnp.concatenate([spec, pad], axis=1)
    return istft(spec, cfg, length=length)


# ---------------------------------------------------------------------------
# Streaming (single hop per step; carry replaces the ONNX caches)
# ---------------------------------------------------------------------------

def init_stft_carry(cfg: STFTConfig, batch: int, dtype=jnp.float32) -> Array:
    """Rolling input cache [B, n_fft - hop] (reference: audio_modules.py:238-241)."""
    return jnp.zeros((batch, cfg.cache_len), dtype)


def init_istft_carry(cfg: STFTConfig, batch: int, dtype=jnp.float32) -> Array:
    """Rolling overlap-add cache [B, n_fft - hop] (reference: audio_modules.py:299-303)."""
    return jnp.zeros((batch, cfg.cache_len), dtype)


def stft_streaming_step(
    x: Array, carry: Array, cfg: STFTConfig
) -> tp.Tuple[Array, Array]:
    """One analysis hop. x: [B, hop], carry: [B, n_fft-hop].

    Returns (spec [B, n_freq, 2], new_carry). Equivalent to center=False STFT
    of the signal with the carry contents prepended.
    Reference: functional/audio_modules.py:243-257.
    """
    in_dtype = x.dtype
    frame = jnp.concatenate([carry, x], axis=1).astype(jnp.float32)  # [B, n_fft]
    new_carry = frame[:, -cfg.cache_len:].astype(in_dtype)
    if cfg.method == "matmul":
        spec = jnp.matmul(frame, jnp.asarray(cfg.dft_matrix), precision=_HIGHEST)
        re, im = jnp.split(spec, 2, axis=-1)
    else:
        z = jnp.fft.rfft(frame * jnp.asarray(cfg.window_f32), axis=-1)
        re, im = jnp.real(z), jnp.imag(z)
        if cfg.normalized:
            s = 1.0 / math.sqrt(cfg.n_fft)
            re, im = re * s, im * s
    return jnp.stack([re, im], axis=-1).astype(in_dtype), new_carry  # [B, n_freq, 2]


def istft_streaming_step(
    spec: Array, carry: Array, cfg: STFTConfig
) -> tp.Tuple[Array, Array]:
    """One synthesis hop. spec: [B, n_freq, 2], carry: [B, n_fft-hop].

    Returns (wav [B, hop], new_carry). Uses the steady-state synthesis window
    (window / OLA(window^2)); output is delayed n_fft-hop samples relative to
    the input, exactly like the reference streaming iSTFT
    (reference: functional/audio_modules.py:259-303, docs/docs/onnx.md).
    """
    in_dtype = spec.dtype
    spec = spec.astype(jnp.float32)
    re = spec[..., 0]
    im = spec[..., 1]
    if cfg.method == "matmul":
        frame = jnp.matmul(
            jnp.concatenate([re, im], axis=-1),
            jnp.asarray(cfg.idft_matrix),
            precision=_HIGHEST,
        )
    else:
        z = jax.lax.complex(re, im)
        frame = jnp.fft.irfft(z, n=cfg.n_fft, axis=-1)
        if cfg.normalized:
            frame = frame * math.sqrt(cfg.n_fft)
    frame = frame * jnp.asarray(cfg.synthesis_window)
    frame = frame.at[:, : cfg.cache_len].add(carry.astype(jnp.float32))
    out = frame[:, : cfg.hop_size]
    new_carry = frame[:, -cfg.cache_len:]
    return out.astype(in_dtype), new_carry.astype(in_dtype)


def stft_streaming_chunk(
    x: Array, carry: Array, cfg: STFTConfig
) -> tp.Tuple[Array, Array]:
    """Multi-hop analysis: x [B, hop*C] + carry [B, n_fft-hop] ->
    (spec [B, n_freq, C, 2], new_carry). Identical math to C single-hop
    steps, but the DFT runs as ONE batched matmul/FFT over all C frames —
    the throughput form of streaming."""
    b = x.shape[0]
    buf = jnp.concatenate([carry, x], axis=1)
    new_carry = buf[:, -cfg.cache_len:]
    frames = frame_signal(buf.astype(jnp.float32), cfg.n_fft, cfg.hop_size)
    if cfg.method == "matmul":
        spec = jnp.matmul(frames, jnp.asarray(cfg.dft_matrix),
                          precision=_HIGHEST)
        re, im = jnp.split(spec, 2, axis=-1)
    else:
        z = jnp.fft.rfft(frames * jnp.asarray(cfg.window_f32), axis=-1)
        re, im = jnp.real(z), jnp.imag(z)
        if cfg.normalized:
            s = 1.0 / math.sqrt(cfg.n_fft)
            re, im = re * s, im * s
    out = jnp.stack([re, im], axis=-1).swapaxes(1, 2)  # [B, n_freq, C, 2]
    return out.astype(x.dtype), new_carry


def istft_streaming_chunk(
    spec: Array, carry: Array, cfg: STFTConfig
) -> tp.Tuple[Array, Array]:
    """Multi-hop synthesis: spec [B, n_freq, C, 2] + carry [B, n_fft-hop] ->
    (wav [B, hop*C], new_carry). Same output as C single-hop steps."""
    b, _, c, _ = spec.shape
    specf = spec.astype(jnp.float32)
    re = specf[..., 0].swapaxes(1, 2)  # [B, C, n_freq]
    im = specf[..., 1].swapaxes(1, 2)
    if cfg.method == "matmul":
        frames = jnp.matmul(jnp.concatenate([re, im], axis=-1),
                            jnp.asarray(cfg.idft_matrix), precision=_HIGHEST)
    else:
        frames = jnp.fft.irfft(jax.lax.complex(re, im), n=cfg.n_fft, axis=-1)
        if cfg.normalized:
            frames = frames * math.sqrt(cfg.n_fft)
    frames = frames * jnp.asarray(cfg.synthesis_window)
    y = overlap_add(frames, cfg.hop_size)  # [B, (C-1)*hop + n_fft]
    y = y.at[:, : cfg.cache_len].add(carry.astype(jnp.float32))
    out = y[:, : c * cfg.hop_size]
    new_carry = y[:, c * cfg.hop_size:]
    return out.astype(spec.dtype), new_carry.astype(spec.dtype)


def stream_stft(x: Array, cfg: STFTConfig) -> Array:
    """Scan `stft_streaming_step` over a [B, hop*T] signal -> [B, n_freq, T, 2].

    Mostly used by tests to assert streaming == offline(center=False).
    """
    b, length = x.shape
    t = length // cfg.hop_size
    hops = x[:, : t * cfg.hop_size].reshape(b, t, cfg.hop_size).swapaxes(0, 1)

    def step(carry, xt):
        spec, carry = stft_streaming_step(xt, carry, cfg)
        return carry, spec

    _, specs = jax.lax.scan(step, init_stft_carry(cfg, b, x.dtype), hops)
    return jnp.moveaxis(specs, 0, 2)  # [B, n_freq, T, 2]


def stream_istft(spec: Array, cfg: STFTConfig) -> Array:
    """Scan `istft_streaming_step` over [B, n_freq, T, 2] -> [B, hop*T]."""
    b = spec.shape[0]
    frames = jnp.moveaxis(spec, 2, 0)  # [T, B, n_freq, 2]

    def step(carry, st):
        out, carry = istft_streaming_step(st, carry, cfg)
        return carry, out

    _, outs = jax.lax.scan(step, init_istft_carry(cfg, b, spec.dtype), frames)
    return jnp.swapaxes(outs, 0, 1).reshape(b, -1)
