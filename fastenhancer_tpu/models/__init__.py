"""Model registry: name -> Model class, loaded dynamically by dotted name.

Mirrors the reference's importlib-by-name contract
(reference: wrappers/ns.py:29-32): `get_model("fastenhancer.default")`.
"""
import importlib
import typing as tp

_ALIASES = {
    # reference model names -> module under fastenhancer_tpu.models
    "fastenhancer.default": "fastenhancer.default",
    "fastenhancer.conv_stft": "fastenhancer.conv_stft",
    "fastenhancer.time_kernel": "fastenhancer.time_kernel",
    "fastenhancer.dprnn": "fastenhancer.dprnn",
    "fastenhancer.dptransformer": "fastenhancer.dptransformer",
    "fastenhancer.ln": "fastenhancer.ln",
    "fastenhancer.noncausal": "fastenhancer.noncausal",
    "bsrnn": "bsrnn",
    "fspen": "fspen",
    "lisennet": "lisennet",
}


def get_model_class(name: str) -> tp.Type:
    mod_name = _ALIASES.get(name, name)
    module = importlib.import_module(f"fastenhancer_tpu.models.{mod_name}")
    return module.Model


def get_model(name: str, **model_kwargs):
    return get_model_class(name)(**model_kwargs)
