"""Every generated recipe must build its model and run a forward pass."""
import glob
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import yaml

from fastenhancer_tpu.models import get_model

CONFIGS = sorted(
    os.path.relpath(p, "configs")[:-5]
    for p in glob.glob("configs/**/*.yaml", recursive=True))


@pytest.mark.parametrize("rel", CONFIGS)
def test_model_builds_and_forwards(rel):
    cfg = yaml.safe_load(open(f"configs/{rel}.yaml"))
    if "model_kwargs" not in cfg:
        pytest.skip("not a model recipe (data-synthesis config, e.g. "
                    "shard_test/se_test)")
    kwargs = dict(cfg["model_kwargs"])
    # shrink the big recurrent/attention stacks for test speed; keep the
    # model-specific kwargs themselves untouched
    for key in ("rnnformer_kwargs", "dprnn_kwargs", "dpt_kwargs"):
        if key in kwargs:
            kwargs[key] = dict(kwargs[key], num_blocks=1)
    if "num_layers" in kwargs:
        kwargs["num_layers"] = 1
    if "dpe_kwargs" in kwargs:
        kwargs["dpe_kwargs"] = dict(kwargs["dpe_kwargs"], num_blocks=1)
    if "n_blocks" in kwargs:
        kwargs["n_blocks"] = 1
    model = get_model(cfg["model"], **kwargs)
    variables = model.init(jax.random.PRNGKey(0))
    hop = kwargs["hop_size"]
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((1, hop * 8)).astype(np.float32)
                      * 0.1)
    wav_hat, spec_hat, _ = model.forward(variables, wav, train=False)
    assert wav_hat.shape == wav.shape
    assert np.isfinite(np.asarray(wav_hat)).all(), rel
