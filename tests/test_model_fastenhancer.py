"""fastenhancer.default model tests.

Includes the round-1 parity gate: build the *reference* PyTorch model (from
/root/reference, imported read-only as an oracle — skipped when unavailable),
convert its state_dict with our converter, and require the JAX forward to
match the torch forward within float tolerance. Reference checkpoints released
with the paper load through exactly this path.
"""
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastenhancer_tpu.models import get_model
from fastenhancer_tpu.utils import convert_checkpoint

T_KWARGS = dict(  # configs/fastenhancer/t.yaml model_kwargs
    channels=24,
    kernel_size=[8, 3, 3],
    stride=4,
    rnnformer_kwargs=dict(
        num_blocks=2, channels=20, freq=16, num_heads=4, eps=1.0e-5,
        positional_embedding="train", attn_bias=False, post_act=False,
        pre_norm=False,
    ),
    pre_post_init="linear_fixed",
    n_fft=512, hop_size=256, win_size=512, window="hann",
    stft_normalized=False, mask=None, activation="SiLU",
    input_compression=0.3, normalize_final_conv=True, weight_norm=True,
)


def _build_model():
    return get_model("fastenhancer.default", **T_KWARGS)


def _rand_wav(b=2, t=256 * 40, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, t)).astype(np.float32) * 0.1


# ---------------------------------------------------------------------------
# Self-contained tests
# ---------------------------------------------------------------------------

def test_init_and_param_count():
    model = _build_model()
    variables = model.init(jax.random.PRNGKey(0))
    n = model.num_params(variables["params"])
    # paper: FastEnhancer_T has 22K params (README.md:163)
    assert 20_000 < n < 25_000, n


def test_forward_shapes_and_grad():
    model = _build_model()
    variables = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(_rand_wav())
    wav_hat, spec_hat, new_stats = model.forward(variables, wav, train=True)
    assert wav_hat.shape == wav.shape
    assert spec_hat.shape == (2, 256, 41, 2)
    # train mode must actually update BN stats
    assert not np.allclose(
        np.asarray(new_stats["enc_pre"]["bn"]["mean"]),
        np.asarray(variables["stats"]["enc_pre"]["bn"]["mean"]))

    def loss_fn(params):
        w, s, _ = model.forward(
            {"params": params, "stats": variables["stats"]}, wav, train=True)
        return jnp.mean(jnp.square(w)) + jnp.mean(jnp.square(s))

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_streaming_equals_offline():
    """The single most important invariant (SURVEY §4): scan-carry streaming
    must equal the offline forward on the interior samples."""
    model = _build_model()
    variables = model.init(jax.random.PRNGKey(0))
    b, t = 2, 256 * 30
    wav = jnp.asarray(_rand_wav(b, t))

    y_stream = np.asarray(model.stream(variables, wav))

    # offline oracle with identical (center=False, zero-prepad) framing:
    # run model_forward on streaming-style spectrogram
    from fastenhancer_tpu.functional import (
        STFTConfig, stream_stft, stream_istft, compress, uncompress)
    scfg = STFTConfig(n_fft=512, hop_size=256, center=False)
    spec = stream_stft(wav, scfg)[:, :-1]  # [B, F, T, 2], last bin dropped
    spec = compress(spec, 0.3)
    mask, _, _ = model.model_forward(
        variables["params"], variables["stats"], spec, train=False)
    spec_hat = model.complex_mask_mul(spec, mask)
    spec_hat = uncompress(spec_hat, 0.3)
    pad = jnp.zeros_like(spec_hat[:, :1])
    spec_hat = jnp.concatenate([spec_hat, pad], axis=1)
    y_offline = np.asarray(stream_istft(spec_hat, scfg))

    np.testing.assert_allclose(y_stream, y_offline, atol=1e-4)


def test_fold_preserves_eval_forward():
    model = _build_model()
    variables = model.init(jax.random.PRNGKey(0))
    # make BN stats non-trivial first (one train pass)
    wav = jnp.asarray(_rand_wav())
    _, _, stats = model.forward(variables, wav, train=True)
    variables = {"params": variables["params"], "stats": stats}

    y0, s0, _ = model.forward(variables, wav, train=False)
    folded = model.fold(variables)
    y1, s1, _ = model.forward(folded, wav, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=2e-4)


def test_folded_streaming_still_works():
    model = _build_model()
    variables = model.fold(model.init(jax.random.PRNGKey(0)))
    wav = jnp.asarray(_rand_wav(1, 256 * 10))
    y = model.stream(variables, wav)
    assert np.isfinite(np.asarray(y)).all()


# ---------------------------------------------------------------------------
# Torch-reference parity (oracle; skipped if reference repo unavailable)
# ---------------------------------------------------------------------------

def _import_reference_model():
    import os
    ref = "/root/reference"
    if not os.path.isdir(ref):
        pytest.skip("reference repo not available")
    if "librosa" not in sys.modules:
        # the reference package imports librosa at module scope for TB mel
        # plots only; stub it out (we never call those paths).
        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")
        filters.mel = lambda **kw: np.zeros((1, 1), np.float32)
        librosa.filters = filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
    if ref not in sys.path:
        sys.path.insert(0, ref)
    import importlib
    mod = importlib.import_module("models.fastenhancer.default.model")
    return mod


@pytest.mark.parity
def test_parity_with_reference_torch_model():
    torch = pytest.importorskip("torch")
    mod = _import_reference_model()
    torch.manual_seed(0)
    tmodel = mod.Model(**{k: v for k, v in T_KWARGS.items()})
    tmodel.eval()

    model = _build_model()
    variables = convert_checkpoint(
        tmodel.state_dict(), "fastenhancer.default", T_KWARGS)

    wav = _rand_wav(2, 256 * 20)
    with torch.no_grad():
        t_wav, t_spec = tmodel(torch.from_numpy(wav))
    j_wav, j_spec, _ = model.forward(variables, jnp.asarray(wav), train=False)

    np.testing.assert_allclose(
        np.asarray(j_spec), t_spec.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(j_wav), t_wav.numpy(), atol=2e-4)


@pytest.mark.parity
def test_parity_after_fold_vs_reference_reparam_removal():
    torch = pytest.importorskip("torch")
    mod = _import_reference_model()
    torch.manual_seed(0)
    tmodel = mod.Model(**{k: v for k, v in T_KWARGS.items()})
    tmodel.eval()

    model = _build_model()
    variables = convert_checkpoint(
        tmodel.state_dict(), "fastenhancer.default", T_KWARGS)
    folded = model.fold(variables)

    tmodel.remove_weight_reparameterizations()
    wav = _rand_wav(1, 256 * 12)
    with torch.no_grad():
        t_wav, _ = tmodel(torch.from_numpy(wav))
    j_wav, _, _ = model.forward(folded, jnp.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(j_wav), t_wav.numpy(), atol=2e-4)


@pytest.mark.parity
def test_parity_train_mode_batch_stats():
    """Train-mode forward (batch statistics) must also match the oracle —
    this is what actual training sees."""
    torch = pytest.importorskip("torch")
    mod = _import_reference_model()
    torch.manual_seed(0)
    tmodel = mod.Model(**{k: v for k, v in T_KWARGS.items()})
    tmodel.train()

    model = _build_model()
    variables = convert_checkpoint(
        tmodel.state_dict(), "fastenhancer.default", T_KWARGS)

    wav = _rand_wav(2, 256 * 16)
    t_wav, t_spec = tmodel(torch.from_numpy(wav))
    j_wav, j_spec, new_stats = model.forward(variables, jnp.asarray(wav), train=True)
    np.testing.assert_allclose(
        np.asarray(j_spec), t_spec.detach().numpy(), atol=5e-4)
    # BN running stats after one step must agree too
    np.testing.assert_allclose(
        np.asarray(new_stats["enc_pre"]["bn"]["mean"]),
        tmodel.enc_pre[1].running_mean.detach().numpy(), atol=1e-5)


def test_stft_method_matmul_equivalent():
    """stft_method='matmul' (MXU DFT, the bench default) matches the fft
    form on both apply modes."""
    kwargs = dict(channels=8, kernel_size=[4, 3], stride=4,
                  rnnformer_kwargs=dict(num_blocks=1, channels=8, freq=8,
                                        num_heads=2),
                  n_fft=64, hop_size=32, win_size=64)
    m_fft = get_model("fastenhancer.default", **kwargs)
    m_mm = get_model("fastenhancer.default", stft_method="matmul", **kwargs)
    variables = m_fft.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((2, 32 * 12)).astype(np.float32) * 0.1)
    y1, _, _ = m_fft.forward(variables, wav, train=False)
    y2, _, _ = m_mm.forward(variables, wav, train=False)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)
    s1 = np.asarray(m_fft.stream(variables, wav))
    s2 = np.asarray(m_mm.stream(variables, wav))
    np.testing.assert_allclose(s2, s1, atol=1e-5)
