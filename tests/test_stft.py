"""DSP core tests: parity vs torch.stft/istft, roundtrip, streaming==offline.

The torch *library* (CPU) is used as the numerical oracle — no reference code
is imported.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from fastenhancer_tpu.functional import (
    STFTConfig,
    stft,
    istft,
    compress,
    uncompress,
    compressed_stft,
    compressed_istft,
    stream_stft,
    stream_istft,
    frame_signal,
    overlap_add,
    make_window,
)


def _rand_wav(b=2, t=16000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, t)).astype(np.float32) * 0.1


@pytest.mark.parametrize("win_type", ["hann", "povey", "hann-sqrt", None])
def test_window_matches_torch(win_type):
    n = 512
    ours = make_window(win_type, n)
    if win_type is None:
        ref = torch.ones(n)
    elif win_type == "hann":
        ref = torch.hann_window(n)
    elif win_type == "povey":
        ref = torch.hann_window(n, periodic=False).pow(0.85)
    elif win_type == "hann-sqrt":
        ref = torch.hann_window(n, periodic=False).pow(0.5)
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)


@pytest.mark.parametrize("method", ["fft", "matmul"])
@pytest.mark.parametrize(
    "n_fft,hop,win", [(512, 256, 512), (512, 160, 512), (1024, 512, 1024), (512, 256, 400)]
)
def test_stft_matches_torch(method, n_fft, hop, win):
    x = _rand_wav(t=hop * 50)
    cfg = STFTConfig(n_fft=n_fft, hop_size=hop, win_size=win, method=method)
    ours = np.asarray(stft(jnp.asarray(x), cfg))

    window = torch.hann_window(win)
    ref = torch.stft(
        torch.from_numpy(x), n_fft, hop_length=hop, win_length=win,
        window=window, center=True, pad_mode="reflect",
        onesided=True, return_complex=True,
    )
    ref = torch.view_as_real(ref).numpy()  # [B, F, T, 2]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_istft_matches_torch(method):
    n_fft, hop = 512, 256
    x = _rand_wav(t=hop * 40)
    cfg = STFTConfig(n_fft=n_fft, hop_size=hop, method=method)
    spec = stft(jnp.asarray(x), cfg)
    ours = np.asarray(istft(spec, cfg))

    window = torch.hann_window(n_fft)
    z = torch.view_as_complex(torch.from_numpy(np.asarray(spec)).contiguous())
    ref = torch.istft(
        z, n_fft, hop_length=hop, win_length=n_fft, window=window,
        center=True, onesided=True,
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.parametrize("n_fft,hop", [(512, 256), (512, 160), (1024, 512)])
def test_roundtrip(n_fft, hop):
    x = _rand_wav(t=hop * 60)
    cfg = STFTConfig(n_fft=n_fft, hop_size=hop)
    y = np.asarray(istft(stft(jnp.asarray(x), cfg), cfg, length=x.shape[1]))
    # istft(center) reconstructs exactly except possibly the last partial hop
    np.testing.assert_allclose(y[:, : x.shape[1] - n_fft], x[:, : x.shape[1] - n_fft],
                               atol=1e-4)


def test_compress_roundtrip():
    x = _rand_wav(t=256 * 40)
    cfg = STFTConfig(n_fft=512, hop_size=256)
    spec = compressed_stft(jnp.asarray(x), cfg, 0.3, discard_last_freq_bin=True)
    assert spec.shape[1] == 256  # last bin dropped
    y = np.asarray(
        compressed_istft(spec, cfg, 0.3, discard_last_freq_bin=True, length=x.shape[1])
    )
    # last freq bin energy is tiny for random noise but not zero; loose tol
    assert np.mean((y[:, :-512] - x[:, :-512]) ** 2) < 1e-2


def test_compress_uncompress_inverse():
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.standard_normal((2, 64, 10, 2)).astype(np.float32))
    out = uncompress(compress(spec, 0.3), 0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(spec), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("method", ["fft", "matmul"])
@pytest.mark.parametrize("n_fft,hop", [(512, 256), (512, 128), (1024, 512)])
def test_streaming_stft_equals_offline(method, n_fft, hop):
    """stream(zero carry) == offline center=False STFT of zero-prepadded signal."""
    b, t = 2, hop * 30
    x = _rand_wav(b, t)
    cfg = STFTConfig(n_fft=n_fft, hop_size=hop, center=False, method=method)
    specs = np.asarray(stream_stft(jnp.asarray(x), cfg))  # [B, F, T, 2]

    # offline oracle on the prepadded signal
    xp = np.pad(x, ((0, 0), (n_fft - hop, 0)))
    window = torch.hann_window(n_fft)
    ref = torch.stft(
        torch.from_numpy(xp), n_fft, hop_length=hop, window=window,
        center=False, onesided=True, return_complex=True,
    )
    ref = torch.view_as_real(ref).numpy()
    tt = min(specs.shape[2], ref.shape[2])
    np.testing.assert_allclose(specs[:, :, :tt], ref[:, :, :tt], atol=2e-4)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_streaming_stft_istft_identity(method):
    """stft_step -> istft_step chain reconstructs the signal with n_fft-hop delay."""
    n_fft, hop = 512, 256
    b, t = 2, hop * 40
    x = _rand_wav(b, t)
    cfg = STFTConfig(n_fft=n_fft, hop_size=hop, method=method)
    spec = stream_stft(jnp.asarray(x), cfg)
    y = np.asarray(stream_istft(spec, cfg))
    delay = n_fft - hop
    # after the delay, output reproduces input (skip first n_fft warmup samples)
    np.testing.assert_allclose(
        y[:, n_fft:], x[:, n_fft - delay: t - delay], atol=1e-4
    )


def test_frame_overlap_add_inverse():
    x = _rand_wav(1, 4096)
    for n_fft, hop in [(512, 256), (512, 160)]:
        frames = frame_signal(jnp.asarray(x), n_fft, hop)
        y = overlap_add(frames, hop)
        # each sample appears n_fft//hop-ish times; check first frame region sums
        k = n_fft // hop
        mid = np.asarray(y)[:, n_fft: n_fft + hop]
        expect = x[:, n_fft: n_fft + hop] * (n_fft // hop if n_fft % hop == 0 else (n_fft // hop + 1))
        if n_fft % hop == 0:
            np.testing.assert_allclose(mid, expect, rtol=1e-4)


def test_stft_jit_and_grad():
    cfg = STFTConfig(n_fft=512, hop_size=256)
    x = jnp.asarray(_rand_wav(1, 2560))

    @jax.jit
    def f(x):
        return jnp.sum(jnp.abs(stft(x, cfg)))

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_chunked_streaming_equals_per_frame():
    """stft/istft chunk transforms == per-hop streaming."""
    import jax.numpy as jnp
    from fastenhancer_tpu.functional import (
        STFTConfig, stft_streaming_chunk, istft_streaming_chunk,
        stft_streaming_step, istft_streaming_step, init_stft_carry,
        init_istft_carry, stream_stft,
    )

    cfg = STFTConfig(n_fft=256, hop_size=128)
    rng = np.random.default_rng(0)
    b, c = 2, 4
    wav = jnp.asarray(rng.standard_normal((b, 128 * 12)).astype(np.float32))

    # analysis: 3 chunks of 4 hops vs 12 single hops
    carry = init_stft_carry(cfg, b)
    specs_chunk = []
    for i in range(3):
        s, carry = stft_streaming_chunk(wav[:, i * 512:(i + 1) * 512], carry,
                                        cfg)
        specs_chunk.append(s)
    spec_chunked = jnp.concatenate(specs_chunk, axis=2)
    spec_steps = stream_stft(wav, cfg)
    np.testing.assert_allclose(np.asarray(spec_chunked),
                               np.asarray(spec_steps), atol=1e-5)

    # synthesis
    carry_c = init_istft_carry(cfg, b)
    carry_s = init_istft_carry(cfg, b)
    outs_c, outs_s = [], []
    for i in range(3):
        y, carry_c = istft_streaming_chunk(spec_chunked[:, :, i * 4:(i + 1) * 4],
                                           carry_c, cfg)
        outs_c.append(y)
    for t in range(12):
        y, carry_s = istft_streaming_step(spec_steps[:, :, t], carry_s, cfg)
        outs_s.append(y)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs_c, 1)),
        np.asarray(jnp.concatenate(outs_s, 1)), atol=1e-5)


def test_model_chunked_stream_equals_per_frame():
    from fastenhancer_tpu.models import get_model

    model = get_model("fastenhancer.default", channels=8, kernel_size=[4, 3],
                      stride=4,
                      rnnformer_kwargs=dict(num_blocks=1, channels=8, freq=8,
                                            num_heads=2),
                      n_fft=64, hop_size=32, win_size=64)
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((2, 32 * 24)).astype(np.float32) * 0.1)
    y1 = np.asarray(model.stream(variables, wav))
    y8 = np.asarray(model.stream(variables, wav, chunk_frames=8))
    np.testing.assert_allclose(y8, y1, atol=1e-4)
