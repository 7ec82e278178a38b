"""Wrapper registry (reference: wrappers/__init__.py)."""
from __future__ import annotations

import importlib


def get_wrapper(name: str):
    module = importlib.import_module(f"fastenhancer_tpu.wrappers.{name}")
    return module.ModelWrapper


__all__ = ["get_wrapper"]
