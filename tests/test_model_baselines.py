"""Baseline models (bsrnn / fspen / lisennet): forward, streaming==offline,
torch-oracle parity, param counts vs the paper."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastenhancer_tpu.models import get_model
from fastenhancer_tpu.utils import convert_checkpoint

from test_model_variants import _import_reference, _rand_wav

BSRNN_KWARGS = dict(num_channels=16, num_layers=2, bias=True, affine=True,
                    n_fft=512, hop_size=256, win_size=512, window="hann",
                    input_compression=0.3)  # == others/bsrnn_xxt.yaml
FSPEN_KWARGS = dict(channels=[4, 16, 32], kernel_size=[6, 8, 6],
                    stride=[2, 2, 2],
                    dpe_kwargs=dict(num_blocks=3, channels=16, freq=32,
                                    groups=8, norm="LayerNorm-FreqChannels"),
                    n_fft=512, hop_size=256, win_size=512, window="hann",
                    input_compression=0.3)  # == others/fspen.yaml
LISENNET_KWARGS = dict(num_channels=16, n_blocks=2, n_fft=512, hop_size=256,
                       win_size=512, input_compression=0.3)

ALL = [("bsrnn", BSRNN_KWARGS), ("fspen", FSPEN_KWARGS),
       ("lisennet", LISENNET_KWARGS)]


@pytest.mark.parametrize("name,kwargs", ALL)
def test_forward_and_grad(name, kwargs):
    model = get_model(name, **kwargs)
    variables = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(_rand_wav(2, 256 * 10))
    wav_hat, spec_hat, _ = model.forward(variables, wav, train=True)
    assert wav_hat.shape == wav.shape
    assert np.isfinite(np.asarray(wav_hat)).all()

    def loss_fn(params):
        w, _, _ = model.forward(
            {"params": params, "stats": variables["stats"]}, wav, train=True)
        return jnp.mean(jnp.square(w))

    g = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


@pytest.mark.parametrize("name,kwargs", ALL)
def test_streaming_equals_offline(name, kwargs):
    model = get_model(name, **kwargs)
    variables = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(_rand_wav(1, 256 * 12))
    y_stream = np.asarray(model.stream(variables, wav))

    from fastenhancer_tpu.functional import (
        STFTConfig, stream_stft, stream_istft, compress, uncompress)
    scfg = STFTConfig(n_fft=512, hop_size=256, center=False)
    spec = compress(stream_stft(wav, scfg), 0.3)
    spec_hat, _, _ = model.model_forward(
        variables["params"], variables["stats"], spec, train=False)
    y_off = np.asarray(stream_istft(uncompress(spec_hat, 0.3), scfg))
    np.testing.assert_allclose(y_stream, y_off, atol=1e-4)


@pytest.mark.parity
@pytest.mark.parametrize("name,kwargs", ALL)
def test_param_count_matches_reference(name, kwargs):
    """Exact parameter-count parity with the torch reference model."""
    torch = pytest.importorskip("torch")
    mod = _import_reference(name)
    tmodel = mod.Model(**kwargs)
    t_count = sum(p.numel() for p in tmodel.parameters())
    model = get_model(name, **kwargs)
    j_count = model.num_params(model.init(jax.random.PRNGKey(0))["params"])
    assert j_count == t_count, (j_count, t_count)


@pytest.mark.parity
@pytest.mark.parametrize("name,kwargs", [("bsrnn", BSRNN_KWARGS),
                                         ("fspen", FSPEN_KWARGS)])
def test_parity_with_reference(name, kwargs):
    torch = pytest.importorskip("torch")
    mod = _import_reference(name)
    torch.manual_seed(0)
    tmodel = mod.Model(**kwargs)
    tmodel.eval()
    model = get_model(name, **kwargs)
    variables = convert_checkpoint(tmodel.state_dict(), name, kwargs)
    wav = _rand_wav(2, 256 * 8)
    with torch.no_grad():
        t_wav, t_spec = tmodel(torch.from_numpy(wav))
    j_wav, j_spec, _ = model.forward(variables, jnp.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(j_spec), t_spec.numpy(),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(j_wav), t_wav.numpy(), atol=3e-4)


@pytest.mark.parity
def test_lisennet_parity_with_reference():
    """LiSenNet's phase features are discontinuous at +-pi, so the two STFT
    implementations' last-bit differences flip feature signs. Parity is
    therefore asserted on bit-identical spectra fed to both model cores."""
    torch = pytest.importorskip("torch")
    mod = _import_reference("lisennet")
    torch.manual_seed(0)
    tmodel = mod.Model(**LISENNET_KWARGS)
    tmodel.eval()
    model = get_model("lisennet", **LISENNET_KWARGS)
    variables = convert_checkpoint(tmodel.state_dict(), "lisennet",
                                   LISENNET_KWARGS)
    wav = _rand_wav(2, 256 * 8)
    spec = np.asarray(model.stft(jnp.asarray(wav)))  # compressed [B,F,T,2]

    # torch side: features -> model_forward -> complex mask multiply
    # (reference Model.forward body, models/lisennet/model.py:513-533)
    with torch.no_grad():
        sc = torch.view_as_complex(torch.from_numpy(spec).contiguous())
        x = sc.transpose(1, 2)
        mag, pha = x.abs(), x.angle()
        gd = tmodel.cal_gd(pha)
        ifd = tmodel.cal_ifd(pha)
        feats = torch.stack([mag, gd / torch.pi, ifd / torch.pi], dim=1)
        t_mask, *_ = tmodel.model_forward(feats)
        t_spec_hat = torch.view_as_real(
            torch.view_as_complex(t_mask.contiguous()) * sc)

    j_spec_hat, _, _ = model.model_forward(
        variables["params"], variables["stats"], jnp.asarray(spec),
        train=False)
    np.testing.assert_allclose(np.asarray(j_spec_hat), t_spec_hat.numpy(),
                               atol=3e-4)


@pytest.mark.parity
@pytest.mark.parametrize("name,kwargs", [("bsrnn", BSRNN_KWARGS),
                                         ("fspen", FSPEN_KWARGS)])
def test_parity_after_fold(name, kwargs):
    torch = pytest.importorskip("torch")
    mod = _import_reference(name)
    torch.manual_seed(0)
    tmodel = mod.Model(**kwargs)
    tmodel.eval()
    model = get_model(name, **kwargs)
    variables = convert_checkpoint(tmodel.state_dict(), name, kwargs)
    folded = model.fold(variables)
    tmodel.remove_weight_reparameterizations()
    wav = _rand_wav(1, 256 * 8)
    with torch.no_grad():
        t_wav, _ = tmodel(torch.from_numpy(wav))
    j_wav, _, _ = model.forward(folded, jnp.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(j_wav), t_wav.numpy(), atol=3e-4)


@pytest.mark.parametrize("name,kwargs", ALL)
def test_chunked_stream_equals_per_frame(name, kwargs):
    model = get_model(name, **kwargs)
    variables = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(_rand_wav(1, 256 * 12))
    y1 = np.asarray(model.stream(variables, wav))
    y4 = np.asarray(model.stream(variables, wav, chunk_frames=4))
    np.testing.assert_allclose(y4, y1, atol=1e-4)


def test_bsrnn_grouped_eval_matches_band_loop():
    """The grouped eval form of band_split / mask_decoder (equal-width bands
    batched into one einsum per group) is math-identical to the per-band
    loop form that the train path uses."""
    model = get_model("bsrnn", **BSRNN_KWARGS)
    v = model.init(jax.random.PRNGKey(0))
    # non-trivial running stats so eval BN actually normalizes
    v["stats"] = jax.tree.map(
        lambda x: jnp.abs(x + 0.1) + 0.5 if getattr(x, "ndim", 0) else x,
        v["stats"])

    spec = jax.random.normal(jax.random.PRNGKey(2), (3, 257, 7, 2))
    x_loop, _ = model._band_split(v["params"]["band_split"],
                                  v["stats"]["band_split"], spec, train=False)
    x_grp = model._band_split_eval(v["params"]["band_split"],
                                   v["stats"]["band_split"], spec)
    np.testing.assert_allclose(np.asarray(x_grp), np.asarray(x_loop),
                               atol=1e-6)

    c = BSRNN_KWARGS["num_channels"]
    xd = jax.random.normal(jax.random.PRNGKey(3), (3, model.n_bands, c, 7))
    m_loop, r_loop, _ = model._mask_decoder(
        v["params"]["mask_decoder"], v["stats"]["mask_decoder"], xd,
        train=False)
    m_grp, r_grp = model._mask_decoder_eval(
        v["params"]["mask_decoder"], v["stats"]["mask_decoder"], xd)
    np.testing.assert_allclose(np.asarray(m_grp), np.asarray(m_loop),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_grp), np.asarray(r_loop),
                               atol=1e-6)

    # folded variables drop the norms entirely — grouped path must still match
    vf = model.fold(v)
    xf_loop, _ = model._band_split(vf["params"]["band_split"],
                                   vf["stats"]["band_split"], spec,
                                   train=False)
    xf_grp = model._band_split_eval(vf["params"]["band_split"],
                                    vf["stats"]["band_split"], spec)
    np.testing.assert_allclose(np.asarray(xf_grp), np.asarray(xf_loop),
                               atol=1e-6)
