"""Grouped optimizer over param pytrees with regex param-group partitioning.

The reference partitions torch named_parameters into optimizer groups via
regex lists from `train.optimizer_groups` yaml (reference: optim/__init__.py:
57-125), so that e.g. weight-norm `g` tensors get `projection: disabled` and
pre-BN conv weights get `projection: channelwise`
(reference: configs/fastenhancer/t.yaml:88-109).

The TPU rebuild keeps those configs working: each model exposes
`torch_name(path)` mapping our param-tree paths to the reference's torch
parameter names, the same regex partition runs on those names, and the result
is a *static* leaf->group assignment baked into a pure jit-safe
`update(params, grads, state, lrs)` where `lrs` is a traced [n_groups] vector
(so LR schedules never recompile).

Frozen leaves (reference buffers: fixed positional embeddings / fixed
filterbanks) are excluded from `named_params` and left untouched.
"""
from __future__ import annotations

import re
import typing as tp

import jax
import jax.numpy as jnp

from .adamp import adamp_leaf_update, adamw_leaf_update, adam_leaf_update

Array = jax.Array
Params = tp.Dict[str, tp.Any]
PathKey = tp.Tuple[str, ...]

_LEAF_UPDATES = {
    "AdamP": adamp_leaf_update,
    "AdamW": adamw_leaf_update,
    "Adam": adam_leaf_update,
}


def path_key(path) -> PathKey:
    """jax key-path -> tuple of strings ('rf_blocks', '0', 'rnn', ...)."""
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        else:
            out.append(str(p))
    return tuple(out)


def named_parameters(
    params: Params,
    torch_name: tp.Callable[[PathKey], tp.Optional[str]],
    frozen: tp.Iterable[PathKey] = (),
) -> tp.Dict[str, PathKey]:
    """Reference-style name -> leaf path for every trainable leaf.

    `torch_name` may return None to mark a leaf as a buffer (frozen).
    """
    frozen = set(frozen)
    out: tp.Dict[str, PathKey] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if leaf is None:
            continue
        key = path_key(path)
        if key in frozen:
            continue
        name = torch_name(key)
        if name is None:
            continue
        out[name] = key
    return out


def partition_param_groups(
    named: tp.Dict[str, PathKey],
    optimizer_kwargs: tp.Dict[str, tp.Any],
    optimizer_groups: tp.Optional[tp.Sequence[tp.Mapping[str, tp.Any]]],
) -> tp.Tuple[tp.Dict[PathKey, int], tp.List[tp.Dict[str, tp.Any]]]:
    """Successive regex bipartition, reference semantics
    (optim/__init__.py:14-125): each optimizer_groups entry splits every
    existing group into (no-match, match+overrides). Returns
    (leaf-path -> group index, per-group merged kwargs)."""
    groups: tp.List[tp.Tuple[tp.Dict[str, PathKey], tp.Dict[str, tp.Any]]] = [
        (dict(named), dict(optimizer_kwargs))
    ]
    for hp in optimizer_groups or []:
        hp = dict(hp)
        regex_list = hp.pop("regex_list")
        new_groups = []
        for members, kwargs in groups:
            miss: tp.Dict[str, PathKey] = {}
            hit: tp.Dict[str, PathKey] = {}
            for name, path in members.items():
                if any(re.search(rx, name) for rx in regex_list):
                    hit[name] = path
                else:
                    miss[name] = path
            new_groups.append((miss, kwargs))
            new_groups.append((hit, {**kwargs, **hp}))
        groups = new_groups

    assignment: tp.Dict[PathKey, int] = {}
    group_kwargs: tp.List[tp.Dict[str, tp.Any]] = []
    for members, kwargs in groups:
        gid = len(group_kwargs)
        group_kwargs.append(kwargs)
        for path in members.values():
            assignment[path] = gid
    return assignment, group_kwargs


def _normalize_kwargs(kw: tp.Mapping[str, tp.Any]) -> tp.Dict[str, tp.Any]:
    out = dict(kw)
    betas = out.pop("betas", None)
    if betas is not None:
        out["beta1"], out["beta2"] = float(betas[0]), float(betas[1])
    out.pop("lr", None)  # lr flows through the schedule vector
    proj = out.get("projection")
    if isinstance(proj, str) and proj.isdigit():
        out["projection"] = int(proj)
    return out


class GroupedOptimizer:
    """Per-leaf torch-style optimizer (AdamP/AdamW/Adam) over a param pytree.

    State: {"m": tree, "v": tree, "step": scalar}. `update` is pure — wrap it
    in jit/pjit together with the grad computation. Leaves not in any group
    (frozen buffers) get zero-size moments and are returned unchanged.
    """

    def __init__(
        self,
        name: str,
        params_example: Params,
        assignment: tp.Dict[PathKey, int],
        group_kwargs: tp.Sequence[tp.Mapping[str, tp.Any]],
    ):
        if name not in _LEAF_UPDATES:
            raise ValueError(f"unsupported optimizer {name!r} "
                             f"(supported: {sorted(_LEAF_UPDATES)})")
        self.name = name
        self._leaf_fn = _LEAF_UPDATES[name]
        self.assignment = dict(assignment)
        self.base_lrs = [float(kw.get("lr", 0.0)) for kw in group_kwargs]
        self.group_kwargs = [_normalize_kwargs(kw) for kw in group_kwargs]
        del params_example  # structure captured lazily from init()

    @property
    def n_groups(self) -> int:
        return len(self.group_kwargs)

    def init(self, params: Params) -> Params:
        def moment(path, leaf):
            if leaf is None or path_key(path) not in self.assignment:
                return None
            return jnp.zeros_like(leaf)

        # two independent zero trees (shared leaves would break jit donation)
        return {"m": jax.tree_util.tree_map_with_path(moment, params),
                "v": jax.tree_util.tree_map_with_path(moment, params),
                "step": jnp.zeros((), jnp.int32)}

    def update(
        self, params: Params, grads: Params, state: Params, lrs: Array
    ) -> tp.Tuple[Params, Params]:
        """(params, grads, state, lrs[n_groups]) -> (new_params, new_state)."""
        step = state["step"] + 1
        is_none = lambda x: x is None  # noqa: E731

        leaves_p, treedef = jax.tree_util.tree_flatten_with_path(params)
        leaves_g = jax.tree_util.tree_leaves(grads)
        # moment trees mirror params but hold None at frozen leaves; flatten
        # with None-as-leaf so all four lists align positionally.
        leaves_m = jax.tree_util.tree_leaves(state["m"], is_leaf=is_none)
        leaves_v = jax.tree_util.tree_leaves(state["v"], is_leaf=is_none)
        assert len(leaves_p) == len(leaves_g) == len(leaves_m) == len(leaves_v)

        new_p, new_m, new_v = [], [], []
        for (path, p), g, m, v in zip(leaves_p, leaves_g, leaves_m, leaves_v):
            gid = self.assignment.get(path_key(path))
            if gid is None or m is None:
                new_p.append(p)
                new_m.append(m)
                new_v.append(v)
                continue
            p2, m2, v2 = self._leaf_fn(p, g, m, v, step, lrs[gid],
                                       **self.group_kwargs[gid])
            new_p.append(p2)
            new_m.append(m2)
            new_v.append(v2)

        params_out = jax.tree_util.tree_unflatten(treedef, new_p)
        m_out = jax.tree_util.tree_unflatten(treedef, new_m)
        v_out = jax.tree_util.tree_unflatten(treedef, new_v)
        return params_out, {"m": m_out, "v": v_out, "step": step}
