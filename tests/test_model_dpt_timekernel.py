"""dptransformer + time_kernel: streaming==offline equivalence and torch
parity (rolling KV cache / conv frame caches are the hard streaming states)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastenhancer_tpu.models import get_model
from fastenhancer_tpu.utils import convert_checkpoint

from test_model_variants import _import_reference, _rand_wav

DPT_KWARGS = dict(  # shrunk ablation/dpt_t.yaml
    channels=16, kernel_size=[8, 3, 3], stride=4,
    dpt_kwargs=dict(num_blocks=2, channels=12, freq=16, num_heads=4,
                    eps=1.0e-5, lookbehind=7, positional_embedding="train",
                    attn_bias=False, post_act=False, pre_norm=False),
    pre_post_init="linear_fixed", n_fft=512, hop_size=256, win_size=512,
    window="hann", stft_normalized=False, mask=None, activation="SiLU",
    input_compression=0.3, normalize_final_conv=True, weight_norm=True,
    final_scale=True, final_scale_init="one")

TK_KWARGS = dict(  # shrunk ablation/time_kernel_b.yaml
    channels=16, kernel_size_freq=[8, 3, 3], kernel_size_time=3, stride=4,
    rnnformer_kwargs=dict(num_blocks=2, channels=12, freq=16, num_heads=4,
                          eps=1.0e-5, positional_embedding="train",
                          attn_bias=False, post_act=False, pre_norm=False),
    pre_post_init="linear_fixed", n_fft=512, hop_size=256, win_size=512,
    window="hann", stft_normalized=False, mask=None, activation="SiLU",
    input_compression=0.3, normalize_final_conv=True, weight_norm=True,
    final_scale=True)


@pytest.mark.parametrize("name,kwargs", [
    ("fastenhancer.dptransformer", DPT_KWARGS),
    ("fastenhancer.time_kernel", TK_KWARGS),
])
def test_forward_and_grad(name, kwargs):
    model = get_model(name, **kwargs)
    variables = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(_rand_wav(2, 256 * 12))
    wav_hat, spec_hat, _ = model.forward(variables, wav, train=True)
    assert wav_hat.shape == wav.shape
    assert np.isfinite(np.asarray(wav_hat)).all()

    def loss_fn(params):
        w, _, _ = model.forward(
            {"params": params, "stats": variables["stats"]}, wav, train=True)
        return jnp.mean(jnp.square(w))

    g = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


@pytest.mark.parametrize("name,kwargs", [
    ("fastenhancer.dptransformer", DPT_KWARGS),
    ("fastenhancer.time_kernel", TK_KWARGS),
])
def test_streaming_equals_offline(name, kwargs):
    """Rolling KV / conv caches must replicate the offline (center=False)
    graph exactly — the core invariant of this codebase."""
    model = get_model(name, **kwargs)
    variables = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(_rand_wav(2, 256 * 20))

    y_stream = np.asarray(model.stream(variables, wav))

    from fastenhancer_tpu.functional import (
        STFTConfig, stream_stft, stream_istft, compress, uncompress)
    scfg = STFTConfig(n_fft=512, hop_size=256, center=False)
    spec = compress(stream_stft(wav, scfg)[:, :-1], 0.3)
    mask, _, _ = model.model_forward(
        variables["params"], variables["stats"], spec, train=False)
    spec_hat = uncompress(model.complex_mask_mul(spec, mask), 0.3)
    spec_hat = jnp.concatenate(
        [spec_hat, jnp.zeros_like(spec_hat[:, :1])], axis=1)
    y_offline = np.asarray(stream_istft(spec_hat, scfg))
    np.testing.assert_allclose(y_stream, y_offline, atol=1e-4)


@pytest.mark.parity
@pytest.mark.parametrize("model_name,kwargs", [
    ("fastenhancer.dptransformer", DPT_KWARGS),
    ("fastenhancer.time_kernel", TK_KWARGS),
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
def test_dpt_parity_after_fold():
    torch = pytest.importorskip("torch")
    mod = _import_reference("fastenhancer.dptransformer")
    torch.manual_seed(0)
    tmodel = mod.Model(**DPT_KWARGS)
    tmodel.eval()
    model = get_model("fastenhancer.dptransformer", **DPT_KWARGS)
    variables = convert_checkpoint(tmodel.state_dict(),
                                   "fastenhancer.dptransformer", DPT_KWARGS)
    folded = model.fold(variables)
    tmodel.remove_weight_reparameterizations()
    wav = _rand_wav(1, 256 * 10)
    with torch.no_grad():
        t_wav, _ = tmodel(torch.from_numpy(wav))
    j_wav, _, _ = model.forward(folded, jnp.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(j_wav), t_wav.numpy(), atol=2e-4)


@pytest.mark.parametrize("name,kwargs", [
    ("fastenhancer.dptransformer", DPT_KWARGS),
    ("fastenhancer.time_kernel", TK_KWARGS),
    ("fastenhancer.dprnn", None),
])
def test_chunked_stream_equals_per_frame(name, kwargs):
    if kwargs is None:
        from test_model_variants import DPRNN_KWARGS as kwargs  # noqa: N811
    model = get_model(name, **kwargs)
    variables = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(_rand_wav(2, 256 * 16))
    y1 = np.asarray(model.stream(variables, wav))
    y4 = np.asarray(model.stream(variables, wav, chunk_frames=4))
    np.testing.assert_allclose(y4, y1, atol=1e-4)


@pytest.mark.parametrize("name,kwargs", [
    ("fastenhancer.dptransformer", DPT_KWARGS),   # KV carries + _pe_time closure
    ("fastenhancer.time_kernel", TK_KWARGS),      # 2-D convs, own model_forward
])
def test_remat_grads_match(name, kwargs):
    """train.remat (per-block jax.checkpoint) leaves variant gradients
    unchanged up to float association — guards the checkpointed lambda's
    closure conversion (dptransformer threads params["time_pe"] through a
    model attribute during forward)."""
    model = get_model(name, **kwargs)
    variables = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(_rand_wav(2, model.hop_size * 8))

    grads = []
    for remat in (False, True):
        model.remat = remat

        def loss(params):
            w, s, _ = model.forward(
                {"params": params, "stats": variables["stats"]}, wav,
                train=True)
            return jnp.mean(jnp.square(w)) + jnp.mean(jnp.square(s))

        grads.append(jax.jit(jax.grad(loss))(variables["params"]))
    model.remat = False
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


@pytest.mark.parity
def test_time_kernel_parity_after_fold():
    """Round-3 regression: the inherited fold used a 3-D BN-merge broadcast
    (`g[:, None, None]`) that silently scaled time_kernel's 4-D
    [O, I, k_t, k_f] conv weights along Cin instead of Cout (O == I in
    every recipe, so no shape error), and the streaming path crashed on the
    folded tree's missing "bn" keys."""
    torch = pytest.importorskip("torch")
    mod = _import_reference("fastenhancer.time_kernel")
    torch.manual_seed(0)
    tmodel = mod.Model(**TK_KWARGS)
    tmodel.eval()
    model = get_model("fastenhancer.time_kernel", **TK_KWARGS)
    variables = convert_checkpoint(tmodel.state_dict(),
                                   "fastenhancer.time_kernel", TK_KWARGS)
    folded = model.fold(variables)
    tmodel.remove_weight_reparameterizations()
    wav = _rand_wav(1, 256 * 10)
    with torch.no_grad():
        t_wav, _ = tmodel(torch.from_numpy(wav))
    j_wav, _, _ = model.forward(folded, jnp.asarray(wav), train=False)
    np.testing.assert_allclose(np.asarray(j_wav), t_wav.numpy(), atol=2e-4)

    # folded streaming == unfolded streaming (the bench path used to
    # KeyError on the folded tree's missing "bn")
    streamed_folded = model.stream(folded, jnp.asarray(wav))
    streamed = model.stream(variables, jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(streamed_folded),
                               np.asarray(streamed), atol=2e-4)
