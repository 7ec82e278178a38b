from .step import make_train_step, make_valid_step, make_infer_fn, cast_tree
from .grad_clip import (
    make_clipper,
    clip_grad_norm,
    clip_grad_norm_local,
    clip_grad_value,
    global_norm,
)

__all__ = [
    "make_train_step", "make_valid_step", "make_infer_fn", "cast_tree",
    "make_clipper", "clip_grad_norm", "clip_grad_norm_local",
    "clip_grad_value", "global_norm",
]
