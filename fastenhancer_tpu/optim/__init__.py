"""Optimizer / scheduler factories (reference: optim/__init__.py:128-161).

`get_optimizer(model, params, hp_train)` resolves the optimizer name, runs the
regex param-group partition over reference-style torch parameter names
(provided by `model.torch_name`), and returns a jit-safe `GroupedOptimizer`.
`get_scheduler(optimizer, hp_train)` returns a host-side LR state machine
whose `.lrs` vector feeds the train step each iteration.
"""
from __future__ import annotations

import typing as tp

from .adamp import adamp_leaf_update, adamw_leaf_update, adam_leaf_update
from .optimizer import (
    GroupedOptimizer,
    named_parameters,
    partition_param_groups,
    path_key,
)
from . import lr_scheduler
from .lr_scheduler import (
    Scheduler,
    EmptyScheduler,
    CosineAnnealingLR,
    CosineAnnealingWarmup,
    CosineAnnealingWarmupRestarts,
    ReduceLROnPlateau,
)


def _cfg_get(hp: tp.Any, key: str, default=None):
    """Read from either an attr-dict (HParams) or a plain mapping."""
    if isinstance(hp, dict):
        return hp.get(key, default)
    return getattr(hp, key, default)


def get_optimizer(model, params, hp_train) -> GroupedOptimizer:
    """model must expose torch_name(path)->str|None and (optionally)
    fixed_param_paths(). `params` is the params subtree (not variables)."""
    name = _cfg_get(hp_train, "optimizer")
    optimizer_kwargs = dict(_cfg_get(hp_train, "optimizer_kwargs") or {})
    optimizer_groups = _cfg_get(hp_train, "optimizer_groups")

    frozen = []
    if hasattr(model, "fixed_param_paths"):
        frozen = model.fixed_param_paths()
    named = named_parameters(params, model.torch_name, frozen)
    assignment, group_kwargs = partition_param_groups(
        named, optimizer_kwargs, optimizer_groups)
    return GroupedOptimizer(name, params, assignment, group_kwargs)


def get_scheduler(optimizer: GroupedOptimizer, hp_train) -> Scheduler:
    name = _cfg_get(hp_train, "scheduler")
    kwargs = dict(_cfg_get(hp_train, "scheduler_kwargs") or {})
    base_lrs = optimizer.base_lrs
    if name is None or name == "EmptyScheduler":
        return EmptyScheduler(base_lrs)
    if name in ("CosineAnnealingLR", "CosineAnnealingWarmup"):
        kwargs.setdefault("T_max", _cfg_get(hp_train, "max_epochs"))
        cls = CosineAnnealingLR if name == "CosineAnnealingLR" else CosineAnnealingWarmup
        return cls(base_lrs, **kwargs)
    if name == "CosineAnnealingWarmupRestarts":
        okw = _cfg_get(hp_train, "optimizer_kwargs") or {}
        kwargs.setdefault("max_lr", _cfg_get(okw, "lr"))
        return CosineAnnealingWarmupRestarts(base_lrs, **kwargs)
    if name == "ReduceLROnPlateau":
        return ReduceLROnPlateau(base_lrs, **kwargs)
    raise ValueError(f"unsupported scheduler {name!r}")


__all__ = [
    "GroupedOptimizer", "named_parameters", "partition_param_groups",
    "path_key", "get_optimizer", "get_scheduler", "lr_scheduler",
    "Scheduler", "EmptyScheduler", "CosineAnnealingLR",
    "CosineAnnealingWarmup", "CosineAnnealingWarmupRestarts",
    "ReduceLROnPlateau", "adamp_leaf_update", "adamw_leaf_update",
    "adam_leaf_update",
]
