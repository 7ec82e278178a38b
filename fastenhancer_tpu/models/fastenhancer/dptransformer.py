"""FastEnhancer dptransformer ablation: causal time attention with a fixed
lookbehind window (local attention, not a parallelized long-context scheme).

Reference: models/fastenhancer/dptransformer/model.py — each block is a
causal time MHSA with a learned relative-position bias pe [NH, L+1] shared
across blocks (:583-587) and banded additive mask in offline mode
(expand_attn_map, :151-171), plus the default's frequency MHSA. Streaming
state is a rolling K/V cache of the last L frames per block (:194-236).

TPU form: offline attention is one einsum + banded bias built from iota
(static shapes, MXU-friendly); the streaming step scores the current query
against [cached L, current] keys — both from the same parameters.
"""
from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn as fnn
from .default import Model as DefaultModel, Params, Array, fold_fc_bn, \
    positional_embedding
from .noncausal import hz_grid_linear_weights
from ...functional.mel import mel_fbank_weights


@dataclasses.dataclass
class DPTConfig:
    num_blocks: int = 3
    channels: int = 32
    freq: int = 32
    num_heads: int = 4
    eps: float = 1e-8
    lookbehind: int = 16
    positional_embedding: tp.Optional[str] = "train"
    attn_bias: bool = False
    post_act: bool = False
    pre_norm: bool = False


def banded_bias(pe: Array, tq: int, tk: int, lookbehind: int,
                q_offset: int = 0) -> Array:
    """pe [NH, L+1] -> additive mask [NH, tq, tk]: query i (at global
    position i + q_offset) sees key j iff 0 <= (i + q_offset) - j <= L, with
    bias pe[L - diff] (reference expand_attn_map, :151-171). Offline uses
    (t, t, 0); chunked streaming uses (t, L+t, L) so queries start after the
    cached keys."""
    ti = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0) + q_offset
    tj = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    d = ti - tj
    valid = (d >= 0) & (d <= lookbehind)
    idx = jnp.clip(lookbehind - d, 0, lookbehind)
    band = pe[:, idx]  # [NH, tq, tk]
    return jnp.where(valid, band, -jnp.inf)


class Model(DefaultModel):
    def __init__(
        self,
        channels: int = 64,
        kernel_size: tp.Sequence[int] = (8, 3, 3),
        stride: int = 4,
        dpt_kwargs: tp.Optional[tp.Dict[str, tp.Any]] = None,
        activation: str = "ReLU",
        activation_kwargs: tp.Optional[tp.Dict[str, tp.Any]] = None,
        n_fft: int = 512,
        hop_size: int = 256,
        win_size: int = 512,
        window: tp.Optional[str] = "hann",
        stft_normalized: bool = False,
        mask: tp.Optional[str] = None,
        input_compression: float = 0.3,
        weight_norm: bool = False,
        final_scale: tp.Union[bool, str] = "exp",
        final_scale_init: str = "1/sqrt(fan_in)",
        normalize_final_conv: bool = False,
        pre_post_init: tp.Optional[str] = None,
        sampling_rate: int = 16_000,
        stft_method: str = "fft",
    ):
        self.dpt = DPTConfig(**(dpt_kwargs or {}))
        super().__init__(
            channels=channels, kernel_size=kernel_size, stride=stride,
            rnnformer_kwargs=dict(
                num_blocks=self.dpt.num_blocks, channels=self.dpt.channels,
                freq=self.dpt.freq, num_heads=self.dpt.num_heads,
                eps=self.dpt.eps, pre_norm=self.dpt.pre_norm,
                post_act=self.dpt.post_act, attn_bias=self.dpt.attn_bias,
                positional_embedding=self.dpt.positional_embedding),
            activation=activation, activation_kwargs=activation_kwargs,
            n_fft=n_fft, hop_size=hop_size, win_size=win_size, window=window,
            stft_normalized=stft_normalized, mask=mask,
            input_compression=input_compression, weight_norm=weight_norm,
            normalize_final_conv=normalize_final_conv,
            pre_post_init=pre_post_init, sampling_rate=sampling_rate,
            stft_method=stft_method)
        assert final_scale in (True, False, "exp")
        self.final_scale = final_scale
        self.final_scale_init = final_scale_init
        self.tname_prepost = "dpt"
        self.tname_block = "dpt_block"

    def init(self, key: Array) -> tp.Dict[str, Params]:
        k_pe, key = jax.random.split(key)
        del k_pe
        variables = super().init(key)
        # model-level relative time bias [NH, L+1] (reference :583-587)
        pe = positional_embedding(self.dpt.num_heads, self.dpt.lookbehind + 1)
        variables["params"]["time_pe"] = {"weight": jnp.asarray(pe.T.copy())}
        if self.pre_post_init is not None:
            if self.pre_post_init.startswith("mel"):
                pre_w, post_w = mel_fbank_weights(self.freq, self.dpt.freq,
                                                  self.sampling_rate)
            else:
                pre_w, post_w = hz_grid_linear_weights(self.freq, self.dpt.freq,
                                                       self.sampling_rate)
            variables["params"]["rf_pre"]["lin"]["weight"] = jnp.asarray(pre_w)
            variables["params"]["rf_post"]["lin"]["weight"] = jnp.asarray(post_w)
        return variables

    def _block_init(self, key: Array, i: int) -> tp.Tuple[Params, Params]:
        cfg = self.dpt
        bk = jax.random.split(key, 4)
        time_attn = fnn.init_attention(bk[0], cfg.channels, cfg.attn_bias)
        freq_attn = fnn.init_attention(bk[1], cfg.channels, cfg.attn_bias)
        if self.weight_norm:
            time_attn["qkv"]["weight"] = fnn.to_wn(time_attn["qkv"]["weight"])
            freq_attn["qkv"]["weight"] = fnn.to_wn(freq_attn["qkv"]["weight"])
        bn_t_p, bn_t_s = fnn.init_batch_norm(cfg.channels)
        bn_f_p, bn_f_s = fnn.init_batch_norm(cfg.channels)
        bp: Params = {
            "time_attn": time_attn,
            "time_fc": fnn.torch_linear_init(bk[2], cfg.channels, cfg.channels,
                                             False),
            "time_post_norm": bn_t_p,
            "freq_attn": freq_attn,
            "freq_fc": fnn.torch_linear_init(bk[3], cfg.channels, cfg.channels,
                                             False),
            "freq_post_norm": bn_f_p,
        }
        bs: Params = {"time_post_norm": bn_t_s, "freq_post_norm": bn_f_s}
        if cfg.pre_norm:
            _, bs["time_pre_norm"] = fnn.init_batch_norm(cfg.channels, affine=False)
            _, bs["freq_pre_norm"] = fnn.init_batch_norm(cfg.channels, affine=False)
        if i == 0 and cfg.positional_embedding is not None:
            bp["pe"] = {"weight": jnp.asarray(
                positional_embedding(cfg.channels, cfg.freq))}
        return bp, bs

    # time attention ------------------------------------------------------------

    def _time_attn(self, p: Params, pe: Array, x: Array,
                   carry: tp.Optional[Params]
                   ) -> tp.Tuple[Array, tp.Optional[Params]]:
        """x: [BF, T, C]. carry: {"k","v"} [BF, NH, L, C'] or None.
        Returns (out [BF, T, C], new carry)."""
        cfg = self.dpt
        nh = cfg.num_heads
        bf, t, c = x.shape
        d = c // nh
        w = fnn.maybe_wn_weight(p["qkv"], "weight")
        qkv = x @ w.T
        if "bias" in p["qkv"]:
            qkv = qkv + p["qkv"]["bias"]
        qkv = qkv.reshape(bf, t, nh, 3 * d).transpose(0, 2, 1, 3)  # [BF,NH,T,3C']
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / jnp.sqrt(jnp.asarray(d, x.dtype))
        L = cfg.lookbehind
        if carry is None:
            band = banded_bias(pe.astype(jnp.float32), t, t, L)
            logits = jnp.einsum("bhtc,bhsc->bhts", q, k) * scale
            logits = logits.astype(jnp.float32) + band
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhts,bhsc->bhtc", probs, v)
        elif t == 1:
            # per-frame streaming
            k = jnp.concatenate([carry["k"], k], axis=2)  # [BF, NH, L+1, C']
            v = jnp.concatenate([carry["v"], v], axis=2)
            logits = jnp.sum(q * k, axis=3) * scale       # [BF, NH, L+1]
            logits = logits.astype(jnp.float32) + pe.astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=2).astype(x.dtype)
            out = jnp.einsum("bhs,bhsc->bhc", probs, v)[:, :, None, :]
        else:
            # chunked streaming: queries at global positions L..L+T-1 attend
            # to [cached L, chunk T] keys within the lookbehind band
            k = jnp.concatenate([carry["k"], k], axis=2)  # [BF, NH, L+T, C']
            v = jnp.concatenate([carry["v"], v], axis=2)
            band = banded_bias(pe.astype(jnp.float32), t, L + t, L,
                               q_offset=L)
            logits = jnp.einsum("bhtc,bhsc->bhts", q, k) * scale
            logits = logits.astype(jnp.float32) + band
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhts,bhsc->bhtc", probs, v)
        new_carry = {"k": k[:, :, -L:, :], "v": v[:, :, -L:, :]}
        out = out.transpose(0, 2, 1, 3).reshape(bf, t, c)
        return out, new_carry

    def _block_apply(self, p: Params, s: Params, x: Array,
                     h0: tp.Optional[Params], train: bool
                     ) -> tp.Tuple[Array, Params, tp.Optional[Params]]:
        cfg = self.dpt
        t, b, f, c = x.shape
        new_s = dict(s) if s else None
        bw = self._bn_w_tb() if train else None
        pe_time = self._pe_time  # threaded via model_forward wrapper

        # --- causal time attention ---
        x_in = x
        y = x
        if s is not None and "time_pre_norm" in s:
            y, st = fnn.batch_norm(None, s["time_pre_norm"], y, train=train,
                                   eps=cfg.eps, weight=bw)
            new_s["time_pre_norm"] = st
        # [T,B,F,C] -> [B*F, T, C]
        y = y.transpose(1, 2, 0, 3).reshape(b * f, t, c)
        y, h_t = self._time_attn(p["time_attn"], pe_time, y, h0)
        y = y.reshape(b, f, t, c).transpose(2, 0, 1, 3)
        y = fnn.linear(p["time_fc"], y)
        if p.get("time_post_norm") is not None:
            y, st = fnn.batch_norm(p["time_post_norm"], s["time_post_norm"], y,
                                   train=train, eps=cfg.eps, weight=bw)
            new_s["time_post_norm"] = st
        if cfg.post_act:
            y = self.act(y)
        x = y + x_in

        if "pe" in p:
            x = x + p["pe"]["weight"]

        # --- freq attention ---
        x_in = x
        y = x
        if s is not None and "freq_pre_norm" in s:
            y, st = fnn.batch_norm(None, s["freq_pre_norm"], y, train=train,
                                   eps=cfg.eps, weight=bw)
            new_s["freq_pre_norm"] = st
        y = y.reshape(t * b, f, c)
        y = fnn.attention(p["freq_attn"], y, cfg.num_heads)
        y = y.reshape(t, b, f, c)
        y = fnn.linear(p["freq_fc"], y)
        if p.get("freq_post_norm") is not None:
            y, st = fnn.batch_norm(p["freq_post_norm"], s["freq_post_norm"], y,
                                   train=train, eps=cfg.eps, weight=bw)
            new_s["freq_post_norm"] = st
        if cfg.post_act:
            y = self.act(y)
        x = y + x_in
        return x, h_t, new_s

    def model_forward(self, params: Params, stats: Params, spec: Array,
                      h0=None, train: bool = False):
        # thread the model-level time bias to the blocks
        self._pe_time = params["time_pe"]["weight"]
        try:
            return super().model_forward(params, stats, spec, h0=h0,
                                         train=train)
        finally:
            del self._pe_time

    def _block_carry_init(self, batch: int, dtype) -> Params:
        cfg = self.dpt
        shape = (batch * cfg.freq, cfg.num_heads, cfg.lookbehind,
                 cfg.channels // cfg.num_heads)
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}

    # -- fused-stack streaming (Pallas) ---------------------------------------

    def init_streaming_carry(self, batch: int, dtype=jnp.float32,
                             fused: bool = False) -> Params:
        if not fused:
            return super().init_streaming_carry(batch, dtype)
        # rotating-slot K/V caches for the fused dpt stack kernel
        # (ops/dpt_stack.py): [NB, L, C, B*Fp] channel-major (rows b-major
        # on the lane axis) plus a shared slot pointer. A freshly zeroed
        # cache is correct at ANY pointer value (zero keys reproduce the
        # XLA concat path's cold-start semantics), which is what makes
        # per-slot resets in the serving engine sound while other streams
        # keep their history.
        from ...functional import init_stft_carry, init_istft_carry
        from ...ops.rnnformer_stack import pad_freq

        cfg = self.dpt
        rows = batch * pad_freq(cfg.freq)
        shape = (cfg.num_blocks, cfg.lookbehind, cfg.channels, rows)
        return {
            "stft": init_stft_carry(self.stft_cfg, batch, dtype),
            "istft": init_istft_carry(self.stft_cfg, batch, dtype),
            "kc": jnp.zeros(shape, dtype),
            "vc": jnp.zeros(shape, dtype),
            "ptr": jnp.zeros((), jnp.int32),
        }

    def build_stack_plan(self, variables: Params, dtype=None) -> Params:
        """Pack FOLDED variables for the fused Pallas dpt stack kernel
        (ops/dpt_stack.py). `variables` must be Model.fold() output — the
        kernel implements only the deploy-time block form (post-BNs merged
        into the fcs, optional pre-norms into qkv, post_act=False)."""
        if self.dpt.post_act:
            raise NotImplementedError("fused dpt stack: post_act recipes")
        from ...ops.dpt_stack import plan_dpt_stack

        for bs in variables["stats"]["rf_blocks"]:
            if bs:  # non-empty stats == unfolded BN still present
                raise ValueError("build_stack_plan expects fold() output")
        plan = plan_dpt_stack(variables["params"]["rf_blocks"],
                              variables["params"]["time_pe"]["weight"],
                              self.dpt.freq, self.dpt.num_heads,
                              self.dpt.lookbehind)
        if dtype is not None:
            plan = jax.tree.map(lambda a: a.astype(dtype), plan)
        return plan

    def model_forward_fused(
        self, variables: Params, plan: Params, spec: Array,
        kc: Array, vc: Array, bias_lanes: Array,
    ) -> tp.Tuple[Array, Array, Array]:
        """model_forward (one frame, inference) with the block stack as one
        Pallas program. spec: compressed [B, F, 1, 2]; kc/vc: rotating K/V
        caches in channel-major layout [NB, L, C, B*Fp] (matches
        init_streaming_carry(fused=True) and the dpt_stack plan);
        bias_lanes: per-frame pe bias (ops.dpt_stack.bias_lanes_for_ptr).
        Returns (mask, k_new, v_new)."""
        from ...ops.dpt_stack import dpt_stack_step

        params, stats = variables["params"], variables["stats"]
        x, x_res, skips, b, t, _ = self._encode(params, stats, spec,
                                                train=False)
        y, k_new, v_new = dpt_stack_step(plan, x[0], kc, vc, bias_lanes,
                                         self.dpt.num_heads,
                                         self.dpt.lookbehind)
        mask = self._decode(params, stats, stats, y[None], x_res, skips, b, t,
                            spec.shape[1], train=False)
        return mask, k_new, v_new

    def streaming_step_fused(
        self, variables: Params, plan: Params, carry: Params, wav_hop: Array
    ) -> tp.Tuple[Params, Array]:
        """streaming_step with the block stack fused into one Pallas program
        and the K/V shift replaced by a rotating slot write (ONE
        dynamic_update_slice per cache on the donated carry instead of the
        XLA path's full concat+reslice rewrite). Math matches streaming_step
        on folded variables (tested). carry uses the fused layout
        (init_streaming_carry(fused=True))."""
        from ...ops.dpt_stack import bias_lanes_for_ptr

        lb = self.dpt.lookbehind
        spec, stft_c = self._stream_front(carry, wav_hop)
        ptr = carry["ptr"]
        bias = bias_lanes_for_ptr(plan["time_pe"], ptr, lb)
        mask, k_new, v_new = self.model_forward_fused(
            variables, plan, spec, carry["kc"], carry["vc"], bias)
        kc = jax.lax.dynamic_update_slice(carry["kc"], k_new[:, None],
                                          (0, ptr, 0, 0))
        vc = jax.lax.dynamic_update_slice(carry["vc"], v_new[:, None],
                                          (0, ptr, 0, 0))
        base, wav_out = self._stream_back(spec, mask, carry, stft_c, None)
        return {"stft": base["stft"], "istft": base["istft"],
                "kc": kc, "vc": vc, "ptr": (ptr + 1) % lb}, wav_out

    def _block_fold(self, bp: Params, bs: Params) -> Params:
        eps = self.dpt.eps
        plain = fnn.maybe_wn_weight
        nb: Params = {}
        for which in ("time", "freq"):
            qkv_w = plain(bp[f"{which}_attn"]["qkv"])
            qkv: Params = {"weight": qkv_w}
            if "bias" in bp[f"{which}_attn"]["qkv"]:
                qkv["bias"] = bp[f"{which}_attn"]["qkv"]["bias"]
            if self.dpt.pre_norm:
                st = bs[f"{which}_pre_norm"]
                std = jnp.sqrt(st["var"] + eps)
                beta = -st["mean"] / std
                bias0 = qkv.get("bias", jnp.zeros(qkv_w.shape[0]))
                qkv = {"weight": qkv_w / std, "bias": bias0 + qkv_w @ beta}
            nb[f"{which}_attn"] = {"qkv": qkv}
            nb[f"{which}_fc"] = fold_fc_bn(bp[f"{which}_fc"],
                                           bp[f"{which}_post_norm"],
                                           bs[f"{which}_post_norm"], eps)
            nb[f"{which}_post_norm"] = None
        if "pe" in bp:
            nb["pe"] = bp["pe"]
        return nb

    def fold(self, variables: Params) -> Params:
        out = super().fold(variables)
        out["params"]["time_pe"] = variables["params"]["time_pe"]
        return out

    def fixed_param_paths(self):
        fixed = super().fixed_param_paths()
        if self.dpt.positional_embedding == "fixed":
            fixed = [f for f in fixed
                     if f != ("rf_blocks", "0", "pe", "weight")]
            fixed.append(("rf_blocks", "0", "pe", "weight"))
        return fixed

    def torch_name(self, path: tp.Tuple[str, ...]) -> tp.Optional[str]:
        if path[0] == "time_pe":
            return "pe"
        if path[0] == "rf_blocks":
            i, mod = path[1], path[2]
            prefix = f"dpt_block.{i}"
            if mod in ("time_attn", "freq_attn"):
                leaf = path[4]
                sub = path[5] if len(path) > 5 else None
                if leaf == "weight":
                    if sub is None:
                        return f"{prefix}.{mod}.qkv.weight"
                    which = "original0" if sub == "g" else "original1"
                    return f"{prefix}.{mod}.qkv.parametrizations.weight.{which}"
                return f"{prefix}.{mod}.qkv.{leaf}"
            if mod == "pe":
                return f"{prefix}.pe"
            return f"{prefix}.{mod}.{path[3]}"
        return super().torch_name(path)
