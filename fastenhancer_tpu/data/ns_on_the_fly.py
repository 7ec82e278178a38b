"""On-the-fly noise-suppression pipeline: host synthesis + on-device mixing.

Behavioral rebuild of the reference (reference: utils/data/ns_on_the_fly.py):

  * `NSOnTheFlyDataset` (host, numpy): synthesize fixed-length training
    clips by concatenating randomly drawn clean/noise files with silence
    gaps, normalizing each to a target dBFS via active-segment RMS
    (:60-228);
  * `SNRMixer` (device, JAX): per-batch SNR + output-dBFS mixing with
    clipping-safe joint rescale and optional batched RIR convolution
    (:231-371). The reference runs this on GPU inside the train step; here
    it is a pure jittable function fused into the same XLA program as the
    forward pass. SNR/dBFS draws happen on host per step (matching the
    reference's per-batch `random.choice`) and enter jit as traced scalars.
"""
from __future__ import annotations

import random
import typing as tp
from pathlib import Path

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except ImportError:  # host-only usage
    jax = jnp = None

from .audio_io import read_wav

Scalar = tp.Union[int, float]


def list_audio_files(
    directory: Path,
    ext_list: tp.Sequence[str] = (".wav", ".WAV", ".flac", ".FLAC"),
) -> tp.List[str]:
    out = []
    for p in sorted(directory.rglob("*")):
        if p.is_file() and any(p.name.endswith(e) for e in ext_list):
            out.append(str(p.relative_to(directory)))
    return out


class NSOnTheFlyDataset:
    """Synthesizes (clean, noise[, rir]) items of exactly segment_size samples."""

    def __init__(self, hp, keys: tp.List[str], textprocessor=None,
                 mode: str = "train", batch_size: int = 1, verbose: bool = False):
        del textprocessor, batch_size, verbose
        self.keys = list(keys)
        self.sr: int = hp.sampling_rate
        self.silence = np.zeros(int(hp.silence_length * self.sr), np.float32)

        mx = hp.snr_mixer
        self.segmental_snr: bool = mx.segmental_snr
        self.rms_window_size = round(mx.rms_window_size * self.sr)
        self.activity_threshold = 10 ** (mx.activity_threshold / 20)
        self.target_rms = 10 ** (mx.dataloader_rms / 20)
        self.clean_activity_threshold = mx.clean_activity_threshold
        self.noise_activity_threshold = mx.noise_activity_threshold

        sec = hp[mode]
        self.segment_size: int = sec.segment_size
        self.clean_dir = Path(sec.clean_dir)
        self.noise_dir = Path(sec.noise_dir)
        self.length: int = sec["length"]

        self.clean_filelist = list_audio_files(self.clean_dir)
        self.noise_filelist = list_audio_files(self.noise_dir)

        self.reverb_prob: float = hp.reverb_prob
        assert 0 <= self.reverb_prob <= 1
        self.rir_length = 0
        self.rir_dir: tp.Optional[Path] = None
        self.rir_filelist: tp.List[str] = []
        self.empty_rir = np.array([], np.float32)
        if self.reverb_prob > 0:
            self.rir_length = hp.rir_length
            self.empty_rir = np.zeros(self.rir_length, np.float32)
            self.empty_rir[0] = 1.0
            self.rir_dir = Path(sec.rir_dir)
            self.rir_filelist = list_audio_files(self.rir_dir)

    def __len__(self) -> int:
        return self.length

    def shuffle(self, seed: int) -> None:
        random.Random(seed).shuffle(self.clean_filelist)
        random.Random(seed).shuffle(self.noise_filelist)

    # -- active-segment RMS (host mirror of the mixer math) -------------------

    def rms(self, wav: np.ndarray, activity_ratio: float) -> float:
        if not self.segmental_snr:
            return float(np.sqrt(np.square(wav).mean()))
        num_seg = len(wav) // self.rms_window_size
        wav = wav[: num_seg * self.rms_window_size].reshape(-1, self.rms_window_size)
        seg_rms = np.sqrt(np.square(wav).mean(1))
        active = seg_rms > self.activity_threshold
        n_active = active.sum()
        if n_active < activity_ratio * num_seg:
            return 0.0
        if n_active == 0:
            return float("inf")
        return float((seg_rms * active).sum() / n_active)

    def gen_audio(self, base_dir: Path, filelist: tp.List[str],
                  activity_ratio: float) -> tp.Tuple[np.ndarray, tp.List[str]]:
        """Concatenate random files (+silence gaps) to segment_size
        (reference: ns_on_the_fly.py:148-184)."""
        parts: tp.List[np.ndarray] = []
        names: tp.List[str] = []
        remaining = self.segment_size
        while remaining > 0:
            name = random.choice(filelist)
            audio, _ = read_wav(str(base_dir / name), sr=self.sr)
            names.append(name)
            rms = self.rms(audio, activity_ratio)
            if rms == 0.0:
                continue
            audio = audio * (self.target_rms / (rms + 1e-12))
            if remaining > len(audio):
                remaining -= len(audio)
                gap = min(remaining, len(self.silence))
                parts.extend([audio, self.silence[:gap]])
                remaining -= gap
            else:
                start = random.randint(0, len(audio) - remaining)
                parts.append(audio[start: start + remaining])
                remaining = 0
        return np.concatenate(parts).astype(np.float32), names

    def __getitem__(self, idx: int) -> tp.Dict[str, tp.Any]:
        del idx
        data: tp.Dict[str, tp.Any] = {}
        clean_names = noise_names = None
        if "clean" in self.keys:
            data["clean"], clean_names = self.gen_audio(
                self.clean_dir, self.clean_filelist, self.clean_activity_threshold)
        if "noise" in self.keys:
            data["noise"], noise_names = self.gen_audio(
                self.noise_dir, self.noise_filelist, self.noise_activity_threshold)
        if "rir" in self.keys:
            use_reverb = bool(np.random.random() < self.reverb_prob)
            if use_reverb:
                rir, _ = read_wav(str(self.rir_dir / random.choice(self.rir_filelist)),
                                  sr=self.sr)
                assert len(rir) <= self.rir_length, "rir longer than hp.rir_length"
                rir = np.pad(rir, (0, self.rir_length - len(rir)))
            else:
                rir = self.empty_rir
            data["rir"] = rir.astype(np.float32)
            if "is_reverb" in self.keys:
                data["is_reverb"] = use_reverb
        if "filename" in self.keys:
            data["filename"] = {"clean": clean_names, "noise": noise_names}
        return data


class SNRMixer:
    """Pure-JAX batch mixer (device side of the pipeline).

    __call__(clean, noise, snr, rms_target[, rir]) -> (clean, noise, noisy);
    snr (dB, int draw) and rms_target (dBFS) are per-batch host draws via
    `sample_params`. All math mirrors reference ns_on_the_fly.py:231-371.
    """

    def __init__(
        self,
        sr: int,
        segmental_snr: bool = True,
        activity_threshold: Scalar = -50,
        rms_window_size: float = 0.1,
        dataloader_rms: int = -25,
        snr_range: tp.Sequence[int] = (-5, 20),
        noisy_rms_range: tp.Sequence[int] = (-35, -15),
        clean_activity_threshold: float = 0.5,
        noise_activity_threshold: float = 0.0,
        clipping_threshold: float = 1.0 - np.finfo(np.float32).eps,
    ):
        self.segmental_snr = segmental_snr
        # half-open ranges, matching the reference's list(range(*snr_range))
        self.snr_choices = list(range(*snr_range))
        self.rms_choices = list(range(*noisy_rms_range))
        self.sr = sr
        self.activity_threshold = 10 ** (activity_threshold / 20)
        self.window_size = int(sr * rms_window_size)
        self.clipping_threshold = clipping_threshold
        self.rms_dataloader = 10 ** (dataloader_rms / 20)
        self.clean_activity_threshold = clean_activity_threshold
        self.noise_activity_threshold = noise_activity_threshold

    def sample_params(self, rng: tp.Optional[random.Random] = None
                      ) -> tp.Tuple[int, int]:
        r = rng or random
        return r.choice(self.snr_choices), r.choice(self.rms_choices)

    # -- jittable math --------------------------------------------------------

    def active_rms(self, wav):
        b, t = wav.shape
        num_seg = t // self.window_size
        w = wav[:, : num_seg * self.window_size].reshape(b, num_seg,
                                                         self.window_size)
        rms = jnp.sqrt(jnp.mean(jnp.square(w), axis=2))  # [B, S]
        active = rms > self.activity_threshold
        n_active = jnp.sum(active, axis=1)
        active_rms = jnp.sum(active * rms, axis=1) / jnp.maximum(n_active, 1e-5)
        mask = n_active >= self.clean_activity_threshold * num_seg
        return active_rms[:, None], mask[:, None]

    def _rescale_no_clip(self, scale, clean, noise, noisy):
        max_abs = jnp.maximum(
            jnp.max(jnp.abs(clean), 1, keepdims=True),
            jnp.maximum(jnp.max(jnp.abs(noise), 1, keepdims=True),
                        jnp.max(jnp.abs(noisy), 1, keepdims=True)))
        scale = jnp.minimum(scale, self.clipping_threshold / max_abs)
        return clean * scale, noise * scale, noisy * scale

    def _normalize_out(self, clean, noise, noisy, rms_target):
        rms_noisy = jnp.sqrt(jnp.mean(jnp.square(noisy), 1, keepdims=True))
        rms_noisy = jnp.maximum(rms_noisy, self.activity_threshold)
        scale = 10.0 ** (rms_target / 20.0) / rms_noisy
        return self._rescale_no_clip(scale, clean, noise, noisy)

    def __call__(self, clean, noise, snr, rms_target, rir=None):
        """clean/noise: [B, T]; snr/rms_target: scalars (traced ok);
        rir: optional [B, T_rir]."""
        if rir is not None:
            clean = batch_rir_conv(clean, rir)
        snr = jnp.asarray(snr, jnp.float32)
        rms_target = jnp.asarray(rms_target, jnp.float32)
        if self.segmental_snr:
            rms_clean, mask = self.active_rms(clean)
            scale = rms_clean / self.rms_dataloader * 10.0 ** (-snr / 20.0)
            noise = jnp.where(mask, noise * scale, noise)
            noisy = clean + noise
        else:
            rms_clean = jnp.sqrt(jnp.mean(jnp.square(clean), 1, keepdims=True))
            scale = rms_clean / self.rms_dataloader * 10.0 ** (-snr / 20.0)
            noise = noise * scale
            noisy = clean + noise
        return self._normalize_out(clean, noise, noisy, rms_target)


def batch_rir_conv(x, rir):
    """Per-item full causal convolution x[b] * rir[b], output length = len(x).

    The reference uses grouped conv_transpose1d (ns_on_the_fly.py:357-364);
    on TPU an FFT convolution is faster for typical RIR lengths (thousands of
    taps) and avoids grouped-conv lowering.
    """
    b, t = x.shape
    t_r = rir.shape[1]
    n = t + t_r - 1
    nfft = 1 << (n - 1).bit_length()
    X = jnp.fft.rfft(x, n=nfft)
    H = jnp.fft.rfft(rir, n=nfft)
    y = jnp.fft.irfft(X * H, n=nfft)[:, :t]
    return y.astype(x.dtype)


class DynamicBatchLPF:
    """Per-item random sinc low-pass for 48 kHz bandwidth augmentation
    (reference: wrappers/ns_on_the_fly.py:16-75).

    Each item is low-passed with prob p_lpf by a hann-windowed sinc whose
    cutoff is a random target Nyquist scaled by alpha ~ U(0.95, 1); clean and
    noisy get the same per-item kernel so the pair stays aligned. Non-LPF
    items get a unit delta so the device call has a static shape: host
    samples a [B, K] kernel bank, the device applies one grouped conv.
    """

    def __init__(self, sampling_rate: int = 48000, kernel_size: int = 127,
                 p_lpf: float = 0.0, window: str = "hann",
                 target_sr_list: tp.Sequence[int] = (8000, 16000, 22050,
                                                     24000, 32000, 44100)):
        assert kernel_size % 2 == 1, "kernel must be odd (symmetric FIR)"
        assert window == "hann"
        self.sr = sampling_rate
        self.p_lpf = p_lpf
        self.kernel_size = kernel_size
        self.nyquist_angular = np.asarray(
            [sr_t / sampling_rate for sr_t in target_sr_list], np.float64)
        half = kernel_size // 2
        self.n_grid = np.arange(-half, half + 1, dtype=np.float64)
        # periodic hann, matching torch.hann_window
        k = np.arange(kernel_size, dtype=np.float64)
        self.window = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / kernel_size)
        self.delta = np.zeros(kernel_size, np.float32)
        self.delta[half] = 1.0

    def sample_kernels(self, batch_size: int,
                       rng: tp.Optional[np.random.Generator] = None) -> np.ndarray:
        """[B, K] kernel bank; identity rows where no LPF applies."""
        r = rng or np.random.default_rng()
        out = np.tile(self.delta, (batch_size, 1))
        if self.p_lpf <= 0.0:
            return out
        n_lpf = int((r.random(batch_size) < self.p_lpf).sum())
        if n_lpf == 0:
            return out
        idx = r.integers(0, len(self.nyquist_angular), n_lpf)
        alpha = r.uniform(0.95, 1.0, n_lpf)
        cutoffs = (self.nyquist_angular[idx] * alpha)[:, None]
        h = cutoffs * np.sinc(cutoffs * self.n_grid[None, :]) * self.window
        h = h / h.sum(axis=1, keepdims=True)  # unit DC gain
        out[:n_lpf] = h.astype(np.float32)
        return out

    def __call__(self, wav, kernels):
        """wav: [B, T], kernels: [B, K] -> filtered [B, T] (grouped conv)."""
        b = wav.shape[0]
        pad = self.kernel_size // 2
        x = wav[None, :, :]  # [1, B, T] — batch as channels, groups=B
        k = jnp.asarray(kernels)[:, None, :]  # [B, 1, K]
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1,), padding=((pad, pad),),
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=b)
        return y[0]
