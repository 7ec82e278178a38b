"""FastEnhancer noncausal (offline) variant: bidirectional time-GRU.

Reference: models/fastenhancer/noncausal/model.py — the "huge_noncausal"
recipes. Differences from the default:
  * the block time-GRU is bidirectional, rnn_fc maps 2C -> C (:186-187),
  * the fixed frequency filterbank is built on an absolute-Hz grid with only
    linear init supported (:308-345),
  * no streaming graph (there is no ONNXModel in the reference, :348).
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn as fnn
from .default import (
    Model as DefaultModel,
    Params,
    Array,
    fold_fc_bn,
    fold_prenorm_into_rnn,
    positional_embedding,
)


def hz_grid_linear_weights(freq: int, n_filter: int,
                           sr: int = 16_000) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Triangular filterbank on the absolute-Hz grid
    (reference: models/fastenhancer/noncausal/model.py:315-345)."""
    f_filter = np.linspace(0, sr // 2, n_filter)
    delta_f = (sr // 2) / n_filter
    f_freqs = np.linspace(0, sr // 2, freq)
    down = (f_filter[1:, None] - f_freqs[None, :]) / delta_f
    down = np.concatenate([down, np.ones((1, freq))], axis=0)
    up = (f_freqs[None, :] - f_filter[:-1, None]) / delta_f
    up = np.concatenate([np.ones((1, freq)), up], axis=0)
    pre = np.maximum(0.0, np.minimum(down, up))
    post = pre.T.copy()
    pre = pre / pre.sum(axis=1, keepdims=True)
    post = post / post.sum(axis=1, keepdims=True)
    return pre.astype(np.float32), post.astype(np.float32)


class Model(DefaultModel):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        assert self.pre_post_init in (None, "linear", "linear_fixed"), \
            "noncausal supports only linear filterbank init"

    # absolute-Hz linear filterbank
    def init(self, key: Array) -> tp.Dict[str, Params]:
        variables = super().init(key)
        if self.pre_post_init is not None:
            pre_w, post_w = hz_grid_linear_weights(
                self.freq, self.rf.freq, self.sampling_rate)
            variables["params"]["rf_pre"]["lin"]["weight"] = jnp.asarray(pre_w)
            variables["params"]["rf_post"]["lin"]["weight"] = jnp.asarray(post_w)
        return variables

    def _block_init(self, key: Array, i: int) -> tp.Tuple[Params, Params]:
        rf = self.rf
        bk = jax.random.split(key, 4)
        rnn = fnn.init_bigru(bk[0], rf.channels, rf.channels)
        attn = fnn.init_attention(bk[1], rf.channels, rf.attn_bias)
        if self.weight_norm:
            for d in ("fwd", "bwd"):
                rnn[d]["weight_ih"] = fnn.to_wn(rnn[d]["weight_ih"])
                rnn[d]["weight_hh"] = fnn.to_wn(rnn[d]["weight_hh"])
            attn["qkv"]["weight"] = fnn.to_wn(attn["qkv"]["weight"])
        bn_rnn_p, bn_rnn_s = fnn.init_batch_norm(rf.channels)
        bn_attn_p, bn_attn_s = fnn.init_batch_norm(rf.channels)
        bp: Params = {
            "rnn": rnn,
            "rnn_fc": fnn.torch_linear_init(bk[2], rf.channels,
                                            2 * rf.channels, False),
            "rnn_post_norm": bn_rnn_p,
            "attn": attn,
            "attn_fc": fnn.torch_linear_init(bk[3], rf.channels, rf.channels,
                                             False),
            "attn_post_norm": bn_attn_p,
        }
        bs: Params = {"rnn_post_norm": bn_rnn_s, "attn_post_norm": bn_attn_s}
        if rf.pre_norm:
            _, bs["rnn_pre_norm"] = fnn.init_batch_norm(rf.channels, affine=False)
            _, bs["attn_pre_norm"] = fnn.init_batch_norm(rf.channels, affine=False)
        if i == 0 and rf.positional_embedding is not None:
            bp["pe"] = {"weight": jnp.asarray(
                positional_embedding(rf.channels, rf.freq))}
        return bp, bs

    def _block_apply(self, p: Params, s: Params, x: Array,
                     h0: tp.Optional[Array], train: bool
                     ) -> tp.Tuple[Array, Array, tp.Optional[Params]]:
        rf = self.rf
        t, b, f, c = x.shape
        new_s = dict(s) if s else None
        bw = self._bn_w_tb() if train else None

        x_in = x
        y = x
        if s is not None and "rnn_pre_norm" in s:
            y, st = fnn.batch_norm(None, s["rnn_pre_norm"], y, train=train,
                                   eps=rf.eps, weight=bw)
            new_s["rnn_pre_norm"] = st
        y = y.reshape(t, b * f, c)
        rnn = {d: {k: fnn.maybe_wn_weight(p["rnn"][d], k)
                   if k.startswith("weight") else p["rnn"][d][k]
                   for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}
               for d in ("fwd", "bwd")}
        y = fnn.bigru(rnn, y)  # [T, B*F, 2C]
        y = y.reshape(t, b, f, 2 * c)
        y = fnn.linear(p["rnn_fc"], y)
        if p.get("rnn_post_norm") is not None:
            y, st = fnn.batch_norm(p["rnn_post_norm"], s["rnn_post_norm"], y,
                                   train=train, eps=rf.eps, weight=bw)
            new_s["rnn_post_norm"] = st
        if rf.post_act:
            y = self.act(y)
        x = y + x_in

        if "pe" in p:
            x = x + p["pe"]["weight"]

        x_in = x
        y = x
        if s is not None and "attn_pre_norm" in s:
            y, st = fnn.batch_norm(None, s["attn_pre_norm"], y, train=train,
                                   eps=rf.eps, weight=bw)
            new_s["attn_pre_norm"] = st
        y = y.reshape(t * b, f, c)
        y = fnn.attention(p["attn"], y, rf.num_heads)
        y = y.reshape(t, b, f, c)
        y = fnn.linear(p["attn_fc"], y)
        if p.get("attn_post_norm") is not None:
            y, st = fnn.batch_norm(p["attn_post_norm"], s["attn_post_norm"], y,
                                   train=train, eps=rf.eps, weight=bw)
            new_s["attn_post_norm"] = st
        if rf.post_act:
            y = self.act(y)
        x = y + x_in
        # bidirectional => no streaming state; return a dummy carry
        return x, jnp.zeros((0,), x.dtype), new_s

    def _block_fold(self, bp: Params, bs: Params) -> Params:
        eps = self.rf.eps
        plain = fnn.maybe_wn_weight
        nb: Params = {}
        rnn = {d: {k: plain(bp["rnn"][d], k) if k.startswith("weight")
                   else bp["rnn"][d][k]
                   for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}
               for d in ("fwd", "bwd")}
        qkv_w = plain(bp["attn"]["qkv"])
        qkv: Params = {"weight": qkv_w}
        if "bias" in bp["attn"]["qkv"]:
            qkv["bias"] = bp["attn"]["qkv"]["bias"]
        nb["rnn_fc"] = fold_fc_bn(bp["rnn_fc"], bp["rnn_post_norm"],
                                  bs["rnn_post_norm"], eps)
        nb["attn_fc"] = fold_fc_bn(bp["attn_fc"], bp["attn_post_norm"],
                                   bs["attn_post_norm"], eps)
        nb["rnn_post_norm"] = None
        nb["attn_post_norm"] = None
        if self.rf.pre_norm:
            st = bs["attn_pre_norm"]
            std = jnp.sqrt(st["var"] + eps)
            beta = -st["mean"] / std
            qkv_bias = qkv.get("bias", jnp.zeros(qkv_w.shape[0]))
            qkv = {"weight": qkv_w / std, "bias": qkv_bias + qkv_w @ beta}
            rnn = {d: fold_prenorm_into_rnn(rnn[d], bs["rnn_pre_norm"], eps)
                   for d in ("fwd", "bwd")}
        nb["rnn"] = rnn
        nb["attn"] = {"qkv": qkv}
        if "pe" in bp:
            nb["pe"] = bp["pe"]
        return nb

    # -- no streaming --------------------------------------------------------------

    def init_streaming_carry(self, batch: int, dtype=jnp.float32):
        raise NotImplementedError("noncausal model has no streaming graph "
                                  "(reference has no ONNXModel either)")

    def streaming_step(self, *a, **k):
        raise NotImplementedError("noncausal model has no streaming graph")

    def torch_name(self, path: tp.Tuple[str, ...]) -> tp.Optional[str]:
        # bidirectional weights map to the *_l0_reverse torch names
        if path[0] == "rf_blocks" and len(path) > 2 and path[2] == "rnn":
            i, direction, leaf = path[1], path[3], path[4]
            sub = path[5] if len(path) > 5 else None
            suffix = "_l0" if direction == "fwd" else "_l0_reverse"
            prefix = f"rf_block.{i}.rnn"
            if leaf.startswith("weight"):
                name = leaf + suffix
                if sub is None:
                    return f"{prefix}.{name}"
                which = "original0" if sub == "g" else "original1"
                return f"{prefix}.parametrizations.{name}.{which}"
            return f"{prefix}.{leaf}{suffix}"
        return super().torch_name(path)
