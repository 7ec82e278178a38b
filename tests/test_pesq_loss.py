"""PESQ-inspired loss sanity: zero at identity, monotone in noise, smooth."""
import numpy as np
import jax
import jax.numpy as jnp

from fastenhancer_tpu.pesq_loss import PESQLoss
from fastenhancer_tpu.losses import Losses


def _speechish(n=16000 * 2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    x = sum(0.1 * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
            for f in (220, 440, 880, 1760))
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)
    return (x * env).astype(np.float32)


def test_identity_is_near_zero_and_monotone():
    loss = PESQLoss()
    ref = jnp.asarray(_speechish())[None]
    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))
    vals = [float(loss(ref, ref + s * noise)) for s in (0.0, 0.01, 0.05, 0.2)]
    assert vals[0] < 0.05, vals
    assert vals[0] < vals[1] < vals[2] < vals[3], vals


def test_gradient_finite_and_nonzero():
    loss = PESQLoss()
    ref = jnp.asarray(_speechish())[None]
    rng = np.random.default_rng(2)
    deg = ref + 0.05 * jnp.asarray(
        rng.standard_normal(ref.shape).astype(np.float32))
    g = jax.grad(lambda d: loss(ref, d))(deg)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_losses_registry_pesq_entry():
    """The VBD recipes' `pesq: {weight: 1e-3}` entry must construct."""
    losses = Losses({"si_snr": {"weight": 1.0}, "pesq": {"weight": 1.0e-3}})
    wav = jnp.asarray(_speechish())[None]
    spec = jnp.zeros((1, 256, 10, 2))
    total, per = losses.calculate(wav * 0.9, spec, wav, spec)
    assert np.isfinite(float(total))
    assert "pesq" in per
