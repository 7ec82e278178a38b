"""FastEnhancer ln ablation: every BatchNorm replaced by sample-local norms.

Reference: models/fastenhancer/ln/model.py — conv units use GroupNorm(1, C)
(:427-509) and the RNNFormer blocks use LayerNorm over [F, C] (:16-37,
210-221). Nothing folds away at deploy time (the ablation exists to show the
BN-fold trick is what makes the default fast): `fold` only strips weight
norm and the final scale.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from ... import nn as fnn
from .default import Model as DefaultModel, Params, Array


def ref_layer_norm(params: tp.Optional[Params], x, eps: float):
    """The reference ln-ablation LayerNorm, replicated LITERALLY including
    its affine quirk: the affine branch computes
        diff + inv_std * weight * bias
    (the normalized diff is never scaled) — models/fastenhancer/ln/model.py:
    27-37 uses `diff.addcmul(w, bias)`. Checkpoints were trained with this
    behavior, so parity requires matching it, not "fixing" it.
    affine=False normalizes properly: diff * inv_std.
    """
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(-2, -1), keepdims=True)
    diff = xf - mean
    var = jnp.mean(jnp.square(diff), axis=(-2, -1), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    if params is not None:
        y = diff + inv * params["weight"] * params["bias"]
    else:
        y = diff * inv
    return y.astype(in_dtype)


class Model(DefaultModel):
    def __init__(self, *args,
                 final_scale: tp.Union[bool, str] = "exp",
                 final_scale_init: str = "1/sqrt(fan_in)",
                 **kwargs):
        super().__init__(*args, **kwargs)
        assert final_scale in (True, False, "exp")
        self.final_scale = final_scale
        self.final_scale_init = final_scale_init

    def init(self, key: Array) -> tp.Dict[str, Params]:
        variables = super().init(key)
        if self.pre_post_init is not None:
            # ln shares the absolute-Hz-grid filterbank with dprnn
            # (reference: models/fastenhancer/ln/model.py:295-350)
            from .noncausal import hz_grid_linear_weights
            from ...functional.mel import mel_fbank_weights

            if self.pre_post_init.startswith("mel"):
                pre_w, post_w = mel_fbank_weights(self.freq, self.rf.freq,
                                                  self.sampling_rate)
            else:
                pre_w, post_w = hz_grid_linear_weights(self.freq, self.rf.freq,
                                                       self.sampling_rate)
            variables["params"]["rf_pre"]["lin"]["weight"] = jnp.asarray(pre_w)
            variables["params"]["rf_post"]["lin"]["weight"] = jnp.asarray(post_w)
        return variables

    # per-site conv bias (reference: models/fastenhancer/ln/model.py:422-510)
    _SITE_BIAS = {"enc_pre": True, "encoder": True, "rf_pre": True,
                  "rf_post": True, "decoder1": True, "decoder2": False,
                  "dec_post": False}

    def _conv_block_init(self, key: Array, out_ch: int, in_ch: int, k: int,
                         site: str = "") -> tp.Tuple[Params, Params]:
        p = fnn.torch_conv1d_init(key, out_ch, in_ch, k,
                                  bias=self._SITE_BIAS.get(site, False))
        return {"conv": p, "gn": fnn.init_layer_norm(out_ch)}, {}

    def _block_init(self, key: Array, i: int) -> tp.Tuple[Params, Params]:
        bp, _ = super()._block_init(key, i)
        rf = self.rf
        # post norms are LayerNorms (params only, no running stats)
        bp["rnn_post_norm"] = {"ln": fnn.init_layer_norm(rf.channels)}
        bp["attn_post_norm"] = {"ln": fnn.init_layer_norm(rf.channels)}
        bs: Params = {}
        if rf.pre_norm:
            bp["rnn_pre_norm"] = {"ln": None}
            bp["attn_pre_norm"] = {"ln": None}
        return bp, bs

    def _block_apply(self, p: Params, s: Params, x: Array,
                     h0: tp.Optional[Array], train: bool
                     ) -> tp.Tuple[Array, Array, tp.Optional[Params]]:
        rf = self.rf
        t, b, f, c = x.shape
        eps = rf.eps

        x_in = x
        y = x
        if "rnn_pre_norm" in p:
            y = ref_layer_norm(p["rnn_pre_norm"]["ln"], y, eps)
        y = y.reshape(t, b * f, c)
        if h0 is None:
            h0 = jnp.zeros((b * f, c), x.dtype)
        rnn = {k: fnn.maybe_wn_weight(p["rnn"], k) if k.startswith("weight")
               else p["rnn"][k]
               for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}
        y, h_t = fnn.gru(rnn, y, h0)
        y = y.reshape(t, b, f, c)
        y = fnn.linear(p["rnn_fc"], y)
        if p.get("rnn_post_norm") is not None:
            y = ref_layer_norm(p["rnn_post_norm"]["ln"], y, eps)
        if rf.post_act:
            y = self.act(y)
        x = y + x_in

        if "pe" in p:
            x = x + p["pe"]["weight"]

        x_in = x
        y = x
        if "attn_pre_norm" in p:
            y = ref_layer_norm(p["attn_pre_norm"]["ln"], y, eps)
        y = y.reshape(t * b, f, c)
        y = fnn.attention(p["attn"], y, rf.num_heads)
        y = y.reshape(t, b, f, c)
        y = fnn.linear(p["attn_fc"], y)
        if p.get("attn_post_norm") is not None:
            y = ref_layer_norm(p["attn_post_norm"]["ln"], y, eps)
        if rf.post_act:
            y = self.act(y)
        x = y + x_in
        return x, h_t, None

    def fold(self, variables: Params) -> Params:
        """Strip weight norm + final scale only — LayerNorm/GroupNorm are
        data-dependent and cannot fold (that is the ablation's finding)."""
        params = jax.tree.map(lambda x: x, variables["params"],
                              is_leaf=lambda x: x is None)

        def strip(tree):
            if isinstance(tree, dict):
                if set(tree) == {"g", "v"}:
                    return fnn.wn_weight(tree)
                return {k: strip(v) for k, v in tree.items()}
            if isinstance(tree, list):
                return [strip(v) for v in tree]
            return tree

        out = strip(params)
        convt = dict(out["dec_post"]["convt"])
        if "scale" in convt:
            w = convt["weight"]
            scale = convt.pop("scale")
            if self.final_scale == "exp":
                scale = jnp.exp(scale)
            if self.normalize_final_conv:
                w = w / jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(w))), 1e-12)
            convt["weight"] = w * scale
        out["dec_post"]["convt"] = convt
        return {"params": out, "stats": variables["stats"]}

    def build_stack_plan(self, variables: Params, dtype=None) -> Params:
        """Pack FOLDED rf_blocks params for the fused Pallas stack kernel in
        its LN-ablation form (ops/rnnformer_stack.py plan_stack ln_eps=...):
        the sample-local LayerNorms cannot fold, so the kernel applies them
        inline after each fc. Inherits streaming_step_fused /
        model_forward_fused / stream(fused_plan=...) from the default model
        unchanged — only the plan differs."""
        if self.rf.post_act:
            raise NotImplementedError("fused ln stack: post_act recipes")
        if self.rf.pre_norm:
            raise NotImplementedError("fused ln stack: pre_norm recipes")
        from ...ops.rnnformer_stack import plan_stack

        plan = plan_stack(variables["params"]["rf_blocks"], self.block_freq,
                          self.rf.num_heads, ln_eps=self.rf.eps)
        if dtype is not None:
            plan = jax.tree.map(lambda a: a.astype(dtype), plan)
        return plan

    def torch_name(self, path: tp.Tuple[str, ...]) -> tp.Optional[str]:
        # GroupNorm replaces BN at the same sequential indices; LayerNorm
        # params live at the same block attribute names.
        ren = {"gn": "bn", "gn1": "bn1", "gn2": "bn2"}
        key = tuple(ren.get(p, p) for p in path)
        if key[0] == "rf_blocks" and len(key) > 2 and key[2].endswith("_norm"):
            return f"rf_block.{key[1]}.{key[2]}.{key[4]}"
        return super().torch_name(key)
