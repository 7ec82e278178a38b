"""NN layer parity tests vs the torch library (CPU oracle)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from fastenhancer_tpu import nn as fnn


def _np(x):
    return np.asarray(x)


def test_linear_matches_torch():
    torch.manual_seed(0)
    lin = tnn.Linear(12, 7)
    params = {"weight": jnp.asarray(lin.weight.detach().numpy()),
              "bias": jnp.asarray(lin.bias.detach().numpy())}
    x = np.random.default_rng(0).standard_normal((5, 12)).astype(np.float32)
    ours = _np(fnn.linear(params, jnp.asarray(x)))
    ref = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("stride,padding,k", [(1, 1, 3), (4, 2, 8), (1, 0, 1)])
def test_conv1d_matches_torch(stride, padding, k):
    torch.manual_seed(0)
    conv = tnn.Conv1d(4, 6, k, stride=stride, padding=padding)
    params = {"weight": jnp.asarray(conv.weight.detach().numpy()),
              "bias": jnp.asarray(conv.bias.detach().numpy())}
    x = np.random.default_rng(0).standard_normal((2, 4, 64)).astype(np.float32)
    # ours is channels-last
    ours = _np(fnn.conv1d_cl(params, jnp.asarray(x.transpose(0, 2, 1)),
                             stride=stride, padding=padding))
    ref = conv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("stride,padding,k", [(4, 2, 8), (2, 0, 4), (1, 1, 3)])
def test_conv_transpose1d_matches_torch(stride, padding, k):
    torch.manual_seed(0)
    conv = tnn.ConvTranspose1d(6, 2, k, stride=stride, padding=padding)
    params = {"weight": jnp.asarray(conv.weight.detach().numpy()),
              "bias": jnp.asarray(conv.bias.detach().numpy())}
    x = np.random.default_rng(0).standard_normal((2, 6, 16)).astype(np.float32)
    ours = _np(fnn.conv_transpose1d_cl(params, jnp.asarray(x.transpose(0, 2, 1)),
                                       stride=stride, padding=padding))
    ref = conv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("affine", [True, False])
def test_batch_norm_train_and_eval_match_torch(affine):
    torch.manual_seed(0)
    c = 10
    bn = tnn.BatchNorm1d(c, eps=1e-5, momentum=0.1, affine=affine)
    params, stats = fnn.init_batch_norm(c, affine=affine)
    x = np.random.default_rng(0).standard_normal((40, c)).astype(np.float32)

    # two train steps (stats update), then eval
    bn.train()
    for i in range(2):
        xi = x + i
        ref = bn(torch.from_numpy(xi)).detach().numpy()
        ours, stats = fnn.batch_norm(params, stats, jnp.asarray(xi), train=True)
        np.testing.assert_allclose(_np(ours), ref, atol=1e-5)
    np.testing.assert_allclose(_np(stats["mean"]), bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(_np(stats["var"]), bn.running_var.numpy(), atol=1e-4)

    bn.eval()
    ref = bn(torch.from_numpy(x)).detach().numpy()
    ours, _ = fnn.batch_norm(params, stats, jnp.asarray(x), train=False)
    np.testing.assert_allclose(_np(ours), ref, atol=1e-5)


def test_gru_matches_torch():
    torch.manual_seed(0)
    i, h, t, n = 8, 12, 20, 6
    g = tnn.GRU(i, h, batch_first=False)
    params = {
        "weight_ih": jnp.asarray(g.weight_ih_l0.detach().numpy()),
        "weight_hh": jnp.asarray(g.weight_hh_l0.detach().numpy()),
        "bias_ih": jnp.asarray(g.bias_ih_l0.detach().numpy()),
        "bias_hh": jnp.asarray(g.bias_hh_l0.detach().numpy()),
    }
    x = np.random.default_rng(0).standard_normal((t, n, i)).astype(np.float32)
    ref_y, ref_h = g(torch.from_numpy(x))
    y, h_t = fnn.gru(params, jnp.asarray(x))
    np.testing.assert_allclose(_np(y), ref_y.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(_np(h_t), ref_h.detach().numpy()[0], atol=1e-5)


def test_gru_step_equals_scan():
    key = jax.random.PRNGKey(0)
    params = fnn.init_gru(key, 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 8))
    y, h_t = fnn.gru(params, x)
    h = jnp.zeros((3, 8))
    for step in range(5):
        h = fnn.gru_step(params, x[step], h)
    np.testing.assert_allclose(_np(h), _np(h_t), atol=1e-6)


def test_attention_matches_torch_sdpa():
    torch.manual_seed(0)
    c, nh = 16, 4
    qkv = tnn.Linear(c, 3 * c, bias=False)
    params = {"qkv": {"weight": jnp.asarray(qkv.weight.detach().numpy())}}
    x = np.random.default_rng(0).standard_normal((3, 10, c)).astype(np.float32)

    # torch oracle replicating the reference Attention.forward split
    xt = torch.from_numpy(x)
    t = qkv(xt).reshape(3, 10, nh, -1).transpose(1, 2)
    d = c // nh
    q, k, v = t[..., :d], t[..., d:2 * d], t[..., 2 * d:]
    ref = torch.nn.functional.scaled_dot_product_attention(q, k, v)
    ref = ref.transpose(1, 2).reshape(3, 10, c).detach().numpy()

    ours = _np(fnn.attention(params, jnp.asarray(x), nh))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_attention_masked_lane_form_matches_einsum():
    """The large-batch masked-lane attention (n >= 64) equals the head-dim
    einsum form (n < 64) — both branches of fnn.attention, same math."""
    c, nh, f = 36, 4, 24
    rng = np.random.default_rng(1)
    params = {"qkv": {
        "weight": jnp.asarray(rng.standard_normal((3 * c, c)).astype(np.float32) * 0.1),
        "bias": jnp.asarray(rng.standard_normal(3 * c).astype(np.float32) * 0.1)}}
    x = jnp.asarray(rng.standard_normal((96, f, c)).astype(np.float32))
    big = _np(fnn.attention(params, x, nh))                 # masked-lane branch
    small = np.concatenate([
        _np(fnn.attention(params, x[i: i + 32], nh))        # einsum branch
        for i in range(0, 96, 32)])
    np.testing.assert_allclose(big, small, atol=2e-6)


def test_weight_norm_matches_torch():
    torch.manual_seed(0)
    lin = tnn.Linear(6, 9, bias=False)
    w0 = lin.weight.detach().numpy().copy()
    lin_wn = tnn.utils.parametrizations.weight_norm(lin)
    g = lin_wn.parametrizations.weight.original0.detach().numpy()
    v = lin_wn.parametrizations.weight.original1.detach().numpy()
    ours = _np(fnn.wn_weight({"g": jnp.asarray(g), "v": jnp.asarray(v)}))
    np.testing.assert_allclose(ours, lin_wn.weight.detach().numpy(), atol=1e-6)
    # and our to_wn decomposition reconstructs the weight
    wn = fnn.to_wn(jnp.asarray(w0))
    np.testing.assert_allclose(_np(fnn.wn_weight(wn)), w0, atol=1e-6)


def test_sync_batchnorm_semantics_under_sharding():
    """batch_norm under pjit with a sharded batch == global-batch statistics."""
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))
    c = 4
    params, stats = fnn.init_batch_norm(c)
    x = np.random.default_rng(0).standard_normal((16, c)).astype(np.float32)

    @jax.jit
    def f(x):
        y, new_stats = fnn.batch_norm(params, stats, x, train=True)
        return y, new_stats

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("dp")))
    y_sharded, st_sharded = f(xs)
    y_local, st_local = f(jnp.asarray(x))
    np.testing.assert_allclose(_np(y_sharded), _np(y_local), atol=1e-5)
    np.testing.assert_allclose(_np(st_sharded["mean"]), _np(st_local["mean"]), atol=1e-6)


def test_lstm_unroll_invariant():
    """lstm/bilstm unroll is a scheduling knob, never a math knob."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fastenhancer_tpu.nn.lstm import lstm, bilstm

    rng = np.random.default_rng(0)
    i, h, t, n = 6, 5, 30, 3
    p = {k: jnp.asarray(rng.standard_normal(s).astype(np.float32)) for k, s in
         [("weight_ih", (4 * h, i)), ("weight_hh", (4 * h, h)),
          ("bias_ih", (4 * h,)), ("bias_hh", (4 * h,))]}
    x = jnp.asarray(rng.standard_normal((t, n, i)).astype(np.float32))
    y8, (h8, c8) = lstm(p, x, unroll=8)
    yf, (hf, cf) = lstm(p, x, unroll=True)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y8), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(h8), atol=1e-6)
    pb = {"fwd": p, "bwd": jax.tree.map(lambda a: a * 0.9, p)}
    np.testing.assert_allclose(np.asarray(bilstm(pb, x, unroll=True)),
                               np.asarray(bilstm(pb, x, unroll=8)), atol=1e-6)
