"""Pallas kernels vs XLA references (interpret mode on the CPU backend)."""
import numpy as np
import jax
import jax.numpy as jnp

from fastenhancer_tpu.nn import init_gru, gru
from fastenhancer_tpu.ops import gru_pallas


def test_gru_scan_pallas_matches_lax_scan():
    params = init_gru(jax.random.PRNGKey(0), 20, 20)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((13, 48, 20)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((48, 20)).astype(np.float32) * 0.1)
    y_ref, ht_ref = gru(params, x, h0)
    y_pal, ht_pal = gru_pallas(params, x, h0, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ht_pal), np.asarray(ht_ref),
                               atol=1e-5)


def test_gru_scan_pallas_weight_norm_params():
    from fastenhancer_tpu.nn import to_wn

    params = init_gru(jax.random.PRNGKey(1), 12, 12)
    params["weight_ih"] = to_wn(params["weight_ih"])
    params["weight_hh"] = to_wn(params["weight_hh"])
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((5, 16, 12)).astype(np.float32))
    y_ref, _ = gru(params, x)
    y_pal, _ = gru_pallas(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               atol=1e-5)
