"""FastEnhancer time_kernel ablation: time-axis receptive field in the
encoder/decoder convolutions.

Reference: models/fastenhancer/time_kernel/model.py — encoder/decoder convs
become CausalConv2d over (time k_t, freq k_f) with a rolling cache of the
last k_t-1 input frames (:119-148); enc_pre and dec_post stay per-frame 1-D;
rf_pre/rf_post are 1x1 (per-frame) convs; the RNNFormer blocks are unchanged.

TPU form: offline runs one NHWC conv over the whole utterance with causal
left padding; streaming concatenates the cached frames — identical math,
one parameter set. The streaming carry bundles {GRU hiddens, encoder conv
caches, decoder conv caches}.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from ... import nn as fnn
from .default import Model as DefaultModel, Params, Array

Carry = tp.Dict[str, tp.Any]


def causal_conv2d(
    p: Params, x: Array, cache: tp.Optional[Array], k_t: int, pad_f: int
) -> tp.Tuple[Array, Array]:
    """x: [B, T, F, Cin]; weight torch layout [Cout, Cin, k_t, k_f].

    cache: [B, k_t-1, F, Cin] previous input frames (zeros offline/None).
    Returns (y [B, T, F', Cout], new_cache)."""
    b, t, f, c = x.shape
    if cache is None:
        cache = jnp.zeros((b, k_t - 1, f, c), x.dtype)
    x = jnp.concatenate([cache, x], axis=1)  # [B, T+k_t-1, F, Cin]
    new_cache = x[:, -(k_t - 1):] if k_t > 1 else jnp.zeros((b, 0, f, c), x.dtype)
    w = jnp.transpose(p["weight"], (2, 3, 1, 0))  # [k_t, k_f, Cin, Cout]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((0, 0), (pad_f, pad_f)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"]
    return y, new_cache


class Model(DefaultModel):
    def __init__(
        self,
        channels: int = 64,
        kernel_size_freq: tp.Sequence[int] = (8, 3, 3),
        kernel_size_time: int = 3,
        stride: int = 4,
        rnnformer_kwargs: tp.Optional[tp.Dict[str, tp.Any]] = None,
        final_scale: tp.Union[bool, str] = "exp",
        **kwargs,
    ):
        super().__init__(channels=channels, kernel_size=list(kernel_size_freq),
                         stride=stride, rnnformer_kwargs=rnnformer_kwargs,
                         **kwargs)
        self.kernel_size_time = kernel_size_time
        assert final_scale in (True, False, "exp")
        self.final_scale = final_scale

    def init(self, key: Array) -> tp.Dict[str, Params]:
        variables = super().init(key)
        if self.pre_post_init is not None:
            # ablations share the absolute-Hz-grid filterbank
            # (reference: models/fastenhancer/time_kernel/model.py:440-500)
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

    # encoder/decoder inner convs are 2-D (time x freq)
    def _conv_block_init(self, key: Array, out_ch: int, in_ch: int, k: int,
                         site: str = "") -> tp.Tuple[Params, Params]:
        if site in ("encoder", "decoder2"):
            k_t = self.kernel_size_time
            fan_in = in_ch * k_t * k
            bound = 1.0 / jnp.sqrt(jnp.asarray(float(fan_in)))
            p = {"weight": jax.random.uniform(
                key, (out_ch, in_ch, k_t, k), jnp.float32, -bound, bound)}
            bn_p, bn_s = fnn.init_batch_norm(out_ch)
            return {"conv": p, "bn": bn_p}, {"bn": bn_s}
        return super()._conv_block_init(key, out_ch, in_ch, k, site)

    # -- time-aware forward ------------------------------------------------------

    def model_forward(
        self, params: Params, stats: Params, spec: Array,
        h0: tp.Optional[Carry] = None, train: bool = False,
        fused_plan: tp.Optional[Params] = None,
    ) -> tp.Tuple[Array, Carry, Params]:
        """spec [B, F, T, 2] -> (mask, carry_out, new_stats). h0 is either
        None (offline: zero caches, discard) or the streaming carry dict
        {"h": [...], "enc": [...], "dec": [...]}.

        fused_plan (build_stack_plan() on folded variables) swaps the
        RNNFormer block loop — unchanged from the default model — for the
        fused Pallas stack kernel (ops/rnnformer_stack.py); requires T == 1
        (per-frame streaming) and h0["h"] in the stacked [NB, B*F', C]
        layout (init_streaming_carry(fused=True)). The 2-D causal
        encoder/decoder convs stay XLA with their frame caches either way."""
        cfg, rf = self, self.rf
        k_t = self.kernel_size_time
        b, f_in, t, _ = spec.shape
        new_stats = jax.tree.map(lambda x: x, stats)
        bw_bt = self._bn_w_bt(b, t) if train else None
        bw_b4 = self._bn_w_b(4) if train else None
        enc_caches = None if h0 is None else h0["enc"]
        dec_caches = None if h0 is None else h0["dec"]
        block_h = None if h0 is None else h0["h"]

        # Encoder PreNet (per-frame 1-D, same as default)
        x = spec.transpose(0, 2, 1, 3).reshape(b * t, f_in, 2)
        x = self._strided_reshape(x)
        x, s = self._conv_bn_act(params["enc_pre"], stats["enc_pre"], x,
                                 train=train, bw=bw_bt)
        if s is not None:
            new_stats["enc_pre"] = s

        # [B*T, F, C] -> [B, T, F, C] for the 2-D causal convs
        f_enc = x.shape[1]
        x = x.reshape(b, t, f_enc, cfg.channels)
        skips = [x]
        enc_caches_out = []
        for i, (p, st) in enumerate(zip(params["encoder"], stats["encoder"])):
            k = cfg.kernel_size[1 + i]
            cache = None if enc_caches is None else enc_caches[i]
            y, cache_out = causal_conv2d(p["conv"], x, cache, k_t, (k - 1) // 2)
            enc_caches_out.append(cache_out)
            if p.get("bn") is not None:  # folded models have BN fused away
                y, new_bn = fnn.batch_norm(p["bn"], st["bn"], y, train=train,
                                           weight=bw_b4)
                if train:
                    new_stats["encoder"][i] = {"bn": new_bn}
            x = self.act(y)
            skips.append(x)

        # rf_pre: freq linear + 1x1 conv + BN (per frame)
        x2 = x.reshape(b * t, f_enc, cfg.channels)
        w_pre = params["rf_pre"]["lin"]["weight"]
        x2 = jnp.einsum("oF,nFc->noc", w_pre, x2)
        x2, s = self._conv_bn_act(params["rf_pre"], stats["rf_pre"], x2,
                                  train=train, act=False, bw=bw_bt)
        if s is not None:
            new_stats["rf_pre"] = s

        cc = x2.shape[-1]
        xb = x2.reshape(b, t, rf.freq, cc).transpose(1, 0, 2, 3)
        if fused_plan is not None:
            from ...ops.rnnformer_stack import rnnformer_stack_step

            y, h_out = rnnformer_stack_step(fused_plan, xb[0], block_h,
                                            rf.num_heads)
            xb = y[None]
        else:
            h_out = []
            for i, (bp, bs) in enumerate(zip(params["rf_blocks"],
                                             stats["rf_blocks"])):
                h_i = None if block_h is None else block_h[i]
                xb, h_t, s = self._apply_block(bp, bs, xb, h_i, train)
                h_out.append(h_t)
                if s is not None:
                    new_stats["rf_blocks"][i] = s

        x2 = xb.transpose(1, 0, 2, 3).reshape(b * t, rf.freq, cc)
        w_post = params["rf_post"]["lin"]["weight"]
        x2 = jnp.einsum("oF,nFc->noc", w_post, x2)
        x2, s = self._conv_bn_act(params["rf_post"], stats["rf_post"], x2,
                                  train=train, act=False, bw=bw_bt)
        if s is not None:
            new_stats["rf_post"] = s
        x = x2.reshape(b, t, f_enc, cfg.channels)

        # Decoder: 1x1 (per frame) + causal 2-D conv
        dec_caches_out = []
        for i, (p, st) in enumerate(zip(params["decoder"], stats["decoder"])):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            y = x.reshape(b * t, f_enc, 2 * cfg.channels)
            y, s1 = self._conv_bn_act(
                {"conv": p["conv1"], "bn": p.get("bn1")},
                {"bn": st["bn1"]} if st and "bn1" in st else None,
                y, train=train, bw=bw_bt)
            y = y.reshape(b, t, f_enc, cfg.channels)
            k = cfg.kernel_size[len(cfg.kernel_size) - 1 - i]
            cache = None if dec_caches is None else dec_caches[i]
            y, cache_out = causal_conv2d(p["conv2"], y, cache, k_t,
                                         (k - 1) // 2)
            dec_caches_out.append(cache_out)
            if p.get("bn2") is not None:  # folded models have BN fused away
                y, new_bn2 = fnn.batch_norm(p["bn2"], st["bn2"], y,
                                            train=train, weight=bw_b4)
                if train:
                    new_stats["decoder"][i] = {"bn1": s1["bn"],
                                               "bn2": new_bn2}
            x = self.act(y)

        # Decoder PostNet (per-frame 1-D)
        x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = x.reshape(b * t, f_enc, 2 * cfg.channels)
        x, s = self._conv_bn_act(params["dec_post"], stats["dec_post"], x,
                                 train=train, bw=bw_bt)
        if s is not None:
            new_stats["dec_post"] = s
        x = self._scaled_convt(params["dec_post"]["convt"], x)

        mask = self.mask_act(x)
        mask = mask.reshape(b, t, f_in, 2).transpose(0, 2, 1, 3)
        carry_out: Carry = {"h": h_out, "enc": enc_caches_out,
                            "dec": dec_caches_out}
        return mask, carry_out, new_stats

    # -- streaming ---------------------------------------------------------------

    def init_streaming_carry(self, batch: int, dtype=jnp.float32,
                             fused: bool = False) -> Params:
        """fused=True stacks the block GRU carries [NB, B*F', C] for the
        fused Pallas stack step; the 2-D conv frame caches are the same
        either way."""
        base = super().init_streaming_carry(batch, dtype, fused=fused)
        k_t = self.kernel_size_time
        f_enc = self.freq
        conv_cache = lambda: jnp.zeros(  # noqa: E731
            (batch, k_t - 1, f_enc, self.channels), dtype)
        base["h"] = {
            "h": base["h"],
            "enc": [conv_cache() for _ in self.kernel_size[1:]],
            "dec": [conv_cache() for _ in self.kernel_size[1:]],
        }
        return base

    def model_forward_fused(
        self, variables: Params, plan: Params, spec: Array, carry_h: Carry
    ) -> tp.Tuple[Array, Carry]:
        """model_forward (one frame, inference) with the block stack as one
        Pallas program (ops/rnnformer_stack.py — the blocks are unchanged
        from the default model); encoder/decoder 2-D causal convs stay XLA
        with their frame caches. spec: compressed [B, F, 1, 2]; carry_h:
        {"h": stacked [NB, B*F', C], "enc": [...], "dec": [...]}.
        Returns (mask, carry_out). Driven by the inherited
        DefaultModel.streaming_step_fused (its list-stack guard is a no-op
        on this dict carry); math matches streaming_step on folded
        variables (tests/test_ops_pallas.py: time_kernel fused-vs-XLA
        stream parity)."""
        params, stats = variables["params"], variables["stats"]
        mask, carry_out, _ = self.model_forward(params, stats, spec,
                                                h0=carry_h, train=False,
                                                fused_plan=plan)
        return mask, carry_out

    def torch_name(self, path: tp.Tuple[str, ...]) -> tp.Optional[str]:
        # decoder SequentialCache indices: 0 conv1, 1 bn1, 3 conv2, 4 bn2
        # (same as default); encoder CausalConv2d at index 0 — same mapping.
        return super().torch_name(path)
