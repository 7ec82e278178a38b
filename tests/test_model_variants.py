"""Variant models: noncausal / conv_stft / dprnn / ln.

Each variant gets (a) self-contained forward/grad/stream checks and (b) a
torch-oracle parity test against the reference implementation with converted
weights (the reference package is imported read-only; torchaudio/librosa are
stubbed — no config we exercise touches them).
"""
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastenhancer_tpu.models import get_model
from fastenhancer_tpu.utils import convert_checkpoint


def _stub_modules():
    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")
        filters.mel = lambda **kw: np.zeros((1, 1), np.float32)
        librosa.filters = filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        taf = types.ModuleType("torchaudio.functional")

        def melscale_fbanks(*a, **k):
            raise RuntimeError("melscale stub: not used by tested configs")

        taf.melscale_fbanks = melscale_fbanks
        ta.functional = taf
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = taf


def _import_reference(model_name: str):
    import importlib
    import os

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not available")
    _stub_modules()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return importlib.import_module(f"models.{model_name}.model")


def _rand_wav(b=2, t=256 * 16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, t)).astype(np.float32) * 0.1


NONCAUSAL_KWARGS = dict(  # shrunk huge_noncausal shape
    channels=16, kernel_size=[8, 3, 3], stride=4,
    rnnformer_kwargs=dict(num_blocks=2, channels=16, freq=16, num_heads=4,
                          eps=1.0e-5, positional_embedding="train",
                          attn_bias=False, post_act=False, pre_norm=False,
                          p_dropout=0.0),
    pre_post_init="linear", n_fft=512, hop_size=256, win_size=512,
    window="hann", stft_normalized=False, mask=None, activation="SiLU",
    input_compression=0.3, normalize_final_conv=True, weight_norm=True)

DPRNN_KWARGS = dict(  # shrunk ablation/dprnn_t.yaml
    channels=16, kernel_size=[8, 3, 3], stride=4,
    dprnn_kwargs=dict(num_blocks=2, channels=12, channels_frnn=6, freq=16,
                      eps=1.0e-5, pre_norm=False),
    pre_post_init="linear_fixed", n_fft=512, hop_size=256, win_size=512,
    window="hann", stft_normalized=False, mask=None, activation="SiLU",
    input_compression=0.3, normalize_final_conv=True, weight_norm=True,
    final_scale=True)

LN_KWARGS = dict(  # shrunk ablation/ln_b.yaml
    channels=16, kernel_size=[8, 3, 3], stride=4,
    rnnformer_kwargs=dict(num_blocks=2, channels=12, freq=16, num_heads=4,
                          eps=1.0e-5, positional_embedding="train",
                          attn_bias=False, post_act=False, pre_norm=False),
    pre_post_init="linear_fixed", n_fft=512, hop_size=256, win_size=512,
    window="hann", stft_normalized=False, mask=None, activation="SiLU",
    input_compression=0.3, normalize_final_conv=True, weight_norm=True,
    final_scale=True, final_scale_init="one")


# ---------------------------------------------------------------------------
# Self-contained
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,kwargs", [
    ("fastenhancer.noncausal", NONCAUSAL_KWARGS),
    ("fastenhancer.conv_stft", dict(channels=16, kernel_size=[8, 3], stride=4,
                                    rnnformer_kwargs=dict(num_blocks=1,
                                                          channels=8, freq=8,
                                                          num_heads=2),
                                    n_fft=256, hop_size=128, win_size=256)),
    ("fastenhancer.dprnn", DPRNN_KWARGS),
    ("fastenhancer.ln", LN_KWARGS),
])
def test_forward_and_grad(name, kwargs):
    model = get_model(name, **kwargs)
    variables = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(_rand_wav(t=model.hop_size * 12))
    wav_hat, spec_hat, _ = model.forward(variables, wav, train=True)
    assert wav_hat.shape == wav.shape
    assert np.isfinite(np.asarray(wav_hat)).all()

    def loss_fn(params):
        w, s, _ = model.forward(
            {"params": params, "stats": variables["stats"]}, wav, train=True)
        return jnp.mean(jnp.square(w))

    g = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


@pytest.mark.parametrize("name,kwargs", [
    ("fastenhancer.conv_stft", dict(channels=16, kernel_size=[8, 3], stride=4,
                                    rnnformer_kwargs=dict(num_blocks=1,
                                                          channels=8, freq=8,
                                                          num_heads=2),
                                    n_fft=256, hop_size=128, win_size=256)),
    ("fastenhancer.dprnn", DPRNN_KWARGS),
    ("fastenhancer.ln", LN_KWARGS),
])
def test_streaming_runs(name, kwargs):
    model = get_model(name, **kwargs)
    variables = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(_rand_wav(1, model.hop_size * 8))
    y = model.stream(variables, wav)
    assert y.shape == wav.shape
    assert np.isfinite(np.asarray(y)).all()


def test_noncausal_has_no_streaming():
    model = get_model("fastenhancer.noncausal", **NONCAUSAL_KWARGS)
    with pytest.raises(NotImplementedError):
        model.init_streaming_carry(1)


def test_dprnn_fold_preserves_eval():
    model = get_model("fastenhancer.dprnn", **DPRNN_KWARGS)
    variables = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(_rand_wav())
    _, _, stats = model.forward(variables, wav, train=True)
    variables = {"params": variables["params"], "stats": stats}
    y0, _, _ = model.forward(variables, wav, train=False)
    y1, _, _ = model.forward(model.fold(variables), wav, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4)


def test_ln_fold_preserves_eval():
    model = get_model("fastenhancer.ln", **LN_KWARGS)
    variables = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(_rand_wav())
    y0, _, _ = model.forward(variables, wav, train=False)
    y1, _, _ = model.forward(model.fold(variables), wav, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4)


# ---------------------------------------------------------------------------
# Torch-oracle parity
# ---------------------------------------------------------------------------

@pytest.mark.parity
@pytest.mark.parametrize("model_name,kwargs", [
    ("fastenhancer.noncausal", NONCAUSAL_KWARGS),
    ("fastenhancer.dprnn", DPRNN_KWARGS),
    ("fastenhancer.ln", LN_KWARGS),
])
def test_parity_with_reference(model_name, kwargs):
    torch = pytest.importorskip("torch")
    mod = _import_reference(model_name)
    torch.manual_seed(0)
    tmodel = mod.Model(**kwargs)
    tmodel.eval()

    model = get_model(model_name, **kwargs)
    variables = convert_checkpoint(tmodel.state_dict(), model_name, kwargs)

    wav = _rand_wav(2, 256 * 12)
    with torch.no_grad():
        t_wav, t_spec = tmodel(torch.from_numpy(wav))
    j_wav, j_spec, _ = model.forward(variables, jnp.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(j_spec), t_spec.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_wav), t_wav.numpy(), atol=2e-4)


@pytest.mark.parity
def test_conv_stft_parity_with_reference():
    """conv_stft shares weights with default; its forward must match the
    reference conv_stft Model (which also trains through CompressedSTFT)."""
    torch = pytest.importorskip("torch")
    mod = _import_reference("fastenhancer.conv_stft")
    kwargs = dict(channels=16, kernel_size=[8, 3], stride=4,
                  rnnformer_kwargs=dict(num_blocks=1, channels=8, freq=8,
                                        num_heads=2),
                  n_fft=256, hop_size=128, win_size=256, weight_norm=True,
                  pre_post_init="linear_fixed", activation="SiLU",
                  normalize_final_conv=True)
    torch.manual_seed(0)
    tmodel = mod.Model(**kwargs)
    tmodel.eval()
    model = get_model("fastenhancer.conv_stft", **kwargs)
    variables = convert_checkpoint(tmodel.state_dict(),
                                   "fastenhancer.conv_stft", kwargs)
    wav = _rand_wav(1, 128 * 12)
    with torch.no_grad():
        t_wav, t_spec = tmodel(torch.from_numpy(wav))
    j_wav, j_spec, _ = model.forward(variables, jnp.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(j_spec), t_spec.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_wav), t_wav.numpy(), atol=2e-4)


@pytest.mark.parity
def test_dprnn_parity_after_fold():
    torch = pytest.importorskip("torch")
    mod = _import_reference("fastenhancer.dprnn")
    torch.manual_seed(0)
    tmodel = mod.Model(**DPRNN_KWARGS)
    tmodel.eval()
    model = get_model("fastenhancer.dprnn", **DPRNN_KWARGS)
    variables = convert_checkpoint(tmodel.state_dict(), "fastenhancer.dprnn",
                                   DPRNN_KWARGS)
    folded = model.fold(variables)
    tmodel.remove_weight_reparameterizations()
    wav = _rand_wav(1, 256 * 10)
    with torch.no_grad():
        t_wav, _ = tmodel(torch.from_numpy(wav))
    j_wav, _, _ = model.forward(folded, jnp.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(j_wav), t_wav.numpy(), atol=2e-4)
