"""Checkpoint save/load with the reference's single-file-per-epoch contract.

Layout mirrors reference wrappers/ns.py:288-336: one file per epoch at
`{base_dir}/{epoch:05d}.ckpt` holding {variables, opt_state, scheduler,
epoch, metrics}; resume discovers the numerically-latest file. Arrays are
stored as raw numpy inside a single .npz-like pickle (no orbax dependency —
the state is a plain pytree and a couple of host scalars; zero-copy and
readable from any Python).
"""
from __future__ import annotations

import os
import pickle
import re
import typing as tp

import jax
import numpy as np

_CKPT_RE = re.compile(r"^([0-9]{5,})\.ckpt$")


def _to_host(tree):
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, tree,
        is_leaf=lambda x: x is None)


def save_checkpoint(
    base_dir: str,
    epoch: int,
    state: tp.Dict[str, tp.Any],
    scheduler_state: tp.Any = None,
    metrics: tp.Any = None,
) -> str:
    os.makedirs(base_dir, exist_ok=True)
    path = os.path.join(base_dir, f"{epoch:05d}.ckpt")
    payload = {
        "variables": _to_host(state["variables"]),
        "opt_state": _to_host(state.get("opt_state")),
        "scheduler": scheduler_state,
        "epoch": epoch,
        "metrics": metrics,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic: no torn checkpoints on preemption
    return path


def latest_checkpoint(base_dir: str) -> tp.Optional[str]:
    """Numerically-latest NNNNN.ckpt in base_dir (reference: ns.py:293-306)."""
    if not os.path.isdir(base_dir):
        return None
    best: tp.Tuple[int, tp.Optional[str]] = (-1, None)
    for name in os.listdir(base_dir):
        m = _CKPT_RE.match(name)
        if m and int(m.group(1)) > best[0]:
            best = (int(m.group(1)), name)
    return os.path.join(base_dir, best[1]) if best[1] else None


def load_checkpoint(path: str) -> tp.Dict[str, tp.Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def clean_checkpoints(base_dir: str, keep_last: int = 1) -> tp.List[str]:
    """Remove all but the newest `keep_last` checkpoints
    (reference: scripts/clean_checkpoint.py:45-72). Returns removed paths."""
    if not os.path.isdir(base_dir):
        return []
    ckpts = sorted(
        (int(m.group(1)), name)
        for name in os.listdir(base_dir)
        if (m := _CKPT_RE.match(name))
    )
    removed = []
    for _, name in ckpts[:-keep_last] if keep_last else ckpts:
        path = os.path.join(base_dir, name)
        os.remove(path)
        removed.append(path)
    return removed
