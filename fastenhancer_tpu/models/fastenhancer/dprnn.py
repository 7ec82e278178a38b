"""FastEnhancer dprnn ablation: freq-MHSA replaced by a bidirectional
frequency GRU (dual-path RNN).

Reference: models/fastenhancer/dprnn/model.py — each block is a causal time
GRU (trnn) followed by a bidirectional frequency GRU (frnn, hidden C/2 per
direction), both with post-BN residuals (:132-246). The frequency filterbank
uses the absolute-Hz grid with linear or mel (slaney/htk, pinv inverse) init
(:251-313). Streaming carry = trnn hidden only (the frnn runs within one
frame).
"""
from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn as fnn
from .default import Model as DefaultModel, Params, Array, fold_fc_bn, \
    fold_prenorm_into_rnn
from .noncausal import hz_grid_linear_weights
from ...functional.mel import mel_fbank_weights


@dataclasses.dataclass
class DPRNNConfig:
    num_blocks: int = 3
    channels: int = 32
    channels_frnn: int = 16
    freq: int = 32
    eps: float = 1e-5
    pre_norm: bool = False



class Model(DefaultModel):
    def __init__(
        self,
        channels: int = 64,
        kernel_size: tp.Sequence[int] = (8, 3, 3),
        stride: int = 4,
        dprnn_kwargs: tp.Optional[tp.Dict[str, tp.Any]] = None,
        activation: str = "ReLU",
        activation_kwargs: tp.Optional[tp.Dict[str, tp.Any]] = None,
        n_fft: int = 512,
        hop_size: int = 160,
        win_size: int = 400,
        window: tp.Optional[str] = "povey",
        stft_normalized: bool = False,
        mask: tp.Optional[str] = None,
        input_compression: float = 0.25,
        weight_norm: bool = False,
        final_scale: tp.Union[bool, str] = "exp",
        normalize_final_conv: bool = False,
        pre_post_init: tp.Optional[str] = None,
        sampling_rate: int = 16_000,
        stft_method: str = "fft",
    ):
        self.dp = DPRNNConfig(**(dprnn_kwargs or {}))
        super().__init__(
            channels=channels, kernel_size=kernel_size, stride=stride,
            rnnformer_kwargs=dict(
                num_blocks=self.dp.num_blocks, channels=self.dp.channels,
                freq=self.dp.freq, eps=self.dp.eps,
                pre_norm=self.dp.pre_norm, positional_embedding=None),
            activation=activation, activation_kwargs=activation_kwargs,
            n_fft=n_fft, hop_size=hop_size, win_size=win_size, window=window,
            stft_normalized=stft_normalized, mask=mask,
            input_compression=input_compression, weight_norm=weight_norm,
            normalize_final_conv=normalize_final_conv,
            pre_post_init=pre_post_init, sampling_rate=sampling_rate,
            stft_method=stft_method)
        assert final_scale in (True, False, "exp")
        self.final_scale = final_scale
        self.tname_prepost = "dprnn"
        self.tname_block = "dprnn_block"

    def init(self, key: Array) -> tp.Dict[str, Params]:
        variables = super().init(key)
        if self.pre_post_init is not None:
            if self.pre_post_init.startswith("mel"):
                pre_w, post_w = mel_fbank_weights(self.freq, self.dp.freq,
                                                  self.sampling_rate)
            else:
                pre_w, post_w = hz_grid_linear_weights(self.freq, self.dp.freq,
                                                       self.sampling_rate)
            variables["params"]["rf_pre"]["lin"]["weight"] = jnp.asarray(pre_w)
            variables["params"]["rf_post"]["lin"]["weight"] = jnp.asarray(post_w)
        return variables

    # -- block: trnn + bidirectional frnn ---------------------------------------

    def _block_init(self, key: Array, i: int) -> tp.Tuple[Params, Params]:
        del i
        dp = self.dp
        bk = jax.random.split(key, 4)
        trnn = fnn.init_gru(bk[0], dp.channels, dp.channels)
        frnn = fnn.init_bigru(bk[1], dp.channels, dp.channels_frnn)
        if self.weight_norm:
            trnn["weight_ih"] = fnn.to_wn(trnn["weight_ih"])
            trnn["weight_hh"] = fnn.to_wn(trnn["weight_hh"])
            for d in ("fwd", "bwd"):
                frnn[d]["weight_ih"] = fnn.to_wn(frnn[d]["weight_ih"])
                frnn[d]["weight_hh"] = fnn.to_wn(frnn[d]["weight_hh"])
        bn_t_p, bn_t_s = fnn.init_batch_norm(dp.channels)
        bn_f_p, bn_f_s = fnn.init_batch_norm(dp.channels)
        bp: Params = {
            "trnn": trnn,
            "trnn_fc": fnn.torch_linear_init(bk[2], dp.channels, dp.channels,
                                             False),
            "trnn_post_norm": bn_t_p,
            "frnn": frnn,
            "frnn_fc": fnn.torch_linear_init(bk[3], dp.channels,
                                             2 * dp.channels_frnn, False),
            "frnn_post_norm": bn_f_p,
        }
        bs: Params = {"trnn_post_norm": bn_t_s, "frnn_post_norm": bn_f_s}
        if dp.pre_norm:
            _, bs["trnn_pre_norm"] = fnn.init_batch_norm(dp.channels, affine=False)
            _, bs["frnn_pre_norm"] = fnn.init_batch_norm(dp.channels, affine=False)
        return bp, bs

    @staticmethod
    def _plain_gru(p: Params) -> Params:
        return {k: fnn.maybe_wn_weight(p, k) if k.startswith("weight") else p[k]
                for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}

    def _block_apply(self, p: Params, s: Params, x: Array,
                     h0: tp.Optional[Array], train: bool
                     ) -> tp.Tuple[Array, Array, tp.Optional[Params]]:
        """Reference: models/fastenhancer/dprnn/model.py:227-246."""
        dp = self.dp
        t, b, f, c = x.shape
        new_s = dict(s) if s else None
        bw = self._bn_w_tb() if train else None

        # --- time GRU ---
        x_in = x
        y = x
        if s is not None and "trnn_pre_norm" in s:
            y, st = fnn.batch_norm(None, s["trnn_pre_norm"], y, train=train,
                                   eps=dp.eps, weight=bw)
            new_s["trnn_pre_norm"] = st
        y = y.reshape(t, b * f, c)
        if h0 is None:
            h0 = jnp.zeros((b * f, c), x.dtype)
        y, h_t = fnn.gru(self._plain_gru(p["trnn"]), y, h0)
        y = y.reshape(t, b, f, c)
        y = fnn.linear(p["trnn_fc"], y)
        if p.get("trnn_post_norm") is not None:
            y, st = fnn.batch_norm(p["trnn_post_norm"], s["trnn_post_norm"], y,
                                   train=train, eps=dp.eps, weight=bw)
            new_s["trnn_post_norm"] = st
        x = y + x_in

        # --- bidirectional freq GRU ---
        x_in = x
        y = x
        if s is not None and "frnn_pre_norm" in s:
            y, st = fnn.batch_norm(None, s["frnn_pre_norm"], y, train=train,
                                   eps=dp.eps, weight=bw)
            new_s["frnn_pre_norm"] = st
        # scan over FREQ: [T,B,F,C] -> [F, T*B, C]
        y = y.reshape(t * b, f, c).swapaxes(0, 1)
        frnn = {d: self._plain_gru(p["frnn"][d]) for d in ("fwd", "bwd")}
        y = fnn.bigru(frnn, y)  # [F, T*B, 2*C_frnn]
        y = y.swapaxes(0, 1).reshape(t, b, f, 2 * dp.channels_frnn)
        y = fnn.linear(p["frnn_fc"], y)
        if p.get("frnn_post_norm") is not None:
            y, st = fnn.batch_norm(p["frnn_post_norm"], s["frnn_post_norm"], y,
                                   train=train, eps=dp.eps, weight=bw)
            new_s["frnn_post_norm"] = st
        x = y + x_in
        return x, h_t, new_s

    # -- fused-stack streaming (Pallas) ---------------------------------------

    def init_streaming_carry(self, batch: int, dtype=jnp.float32,
                             fused: bool = False) -> Params:
        if not fused:
            return super().init_streaming_carry(batch, dtype)
        # stacked time-GRU carries in the kernel's FREQUENCY-MAJOR row
        # order (ops/dprnn_stack.py: band rows contiguous for the sweep)
        from ...functional import init_stft_carry, init_istft_carry

        dp = self.dp
        return {
            "stft": init_stft_carry(self.stft_cfg, batch, dtype),
            "istft": init_istft_carry(self.stft_cfg, batch, dtype),
            "h": jnp.zeros((dp.num_blocks, dp.freq, batch, dp.channels),
                           dtype),
        }

    def build_stack_plan(self, variables: Params, dtype=None) -> Params:
        """Pack FOLDED rf_blocks params for the fused Pallas dprnn stack
        kernel (ops/dprnn_stack.py). `variables` must be Model.fold()
        output — the kernel implements only the deploy-time block form
        (post-BNs merged into the fcs, pre-norms into the GRU weights)."""
        from ...ops.dprnn_stack import plan_dprnn_stack

        for bs in variables["stats"]["rf_blocks"]:
            if bs:  # non-empty stats == unfolded BN still present
                raise ValueError("build_stack_plan expects fold() output")
        plan = plan_dprnn_stack(variables["params"]["rf_blocks"])
        if dtype is not None:
            plan = jax.tree.map(lambda a: a.astype(dtype), plan)
        return plan

    def model_forward_fused(
        self, variables: Params, plan: Params, spec: Array, h: Array
    ) -> tp.Tuple[Array, Array]:
        """model_forward (one frame, inference) with the block stack as one
        Pallas program. spec: compressed [B, F, 1, 2]; h: stacked f-major
        [NB, F', B, C] GRU carries. Returns (mask, h_t)."""
        from ...ops.dprnn_stack import dprnn_stack_step

        params, stats = variables["params"], variables["stats"]
        x, x_res, skips, b, t, _ = self._encode(params, stats, spec,
                                                train=False)
        # kernel rows are f-major: one cheap XLA transpose each way
        y, h_t = dprnn_stack_step(plan, x[0].swapaxes(0, 1), h)
        mask = self._decode(params, stats, stats, y.swapaxes(0, 1)[None],
                            x_res, skips, b, t, spec.shape[1], train=False)
        return mask, h_t

    def streaming_step_fused(
        self, variables: Params, plan: Params, carry: Params, wav_hop: Array
    ) -> tp.Tuple[Params, Array]:
        """streaming_step with the block stack fused into one Pallas
        program. Math matches streaming_step on folded variables
        (tests/test_ops_pallas.py: dprnn fused-vs-XLA stream parity);
        carry uses the fused f-major layout
        (init_streaming_carry(fused=True)).

        Batch constraint: the kernel tiles streams in sublane-aligned
        blocks (8 for f32, 16 for bf16 — ops/dprnn_stack.py _tile_align),
        so the batch needs an aligned divisor on real TPU; the same holds
        for a StreamingEngine(fused=True) capacity. stream() checks
        ops.dprnn_stack.supports_batch and falls back to the XLA path;
        calling this step directly with an unsupported batch raises.

        Perf note: measured ~3% SLOWER than the XLA path at the benched
        dprnn_b/256-stream shape (the single-scan bigru pipelines better)
        — see the ops/dprnn_stack.py module docstring. Exact and
        supported, but the default serving path is the XLA step."""
        spec, stft_c = self._stream_front(carry, wav_hop)
        mask, h_t = self.model_forward_fused(variables, plan, spec,
                                             carry["h"])
        return self._stream_back(spec, mask, carry, stft_c, h_t)

    def _fused_batch_ok(self, batch: int, dtype) -> bool:
        """Single source of truth for the fused kernel's batch-tile check
        (consulted by both stream()'s fallback and validate_fused_batch).
        hd = channels_frnn, the kernel's per-direction sweep hidden (what
        dprnn_stack_step derives from plan w_fhh [NB, 2, H, 3H]). dtype
        must be the ACTIVATION dtype the kernel will see."""
        from ...ops.dprnn_stack import supports_batch

        dp = self.dp
        return supports_batch(batch, dp.freq, dp.channels, dp.channels_frnn,
                              dp.num_blocks, jnp.dtype(dtype).itemsize)

    def validate_fused_batch(self, batch: int, dtype=jnp.float32) -> None:
        """Raise early (with guidance) when a fused serving batch has no
        sublane-aligned kernel tile — called by StreamingEngine(fused=True)
        at construction (per shard when devices>1) and by bench.py before
        labelling a run fused. stream() instead falls back to XLA
        silently."""
        if not self._fused_batch_ok(batch, dtype):
            raise ValueError(
                f"fused dprnn serving needs a sublane-aligned capacity "
                f"(multiple of 8 for f32 / 16 for bf16 with a tile fitting "
                f"VMEM); capacity {batch} with dtype {jnp.dtype(dtype).name} "
                f"has none — use an aligned capacity or fused=False")

    def stream(self, variables: Params, wav: Array,
               chunk_frames: int = 1, unroll: int = 4,
               fused_plan: tp.Optional[Params] = None) -> Array:
        """Whole-utterance streaming (see DefaultModel.stream). When
        `fused_plan` is given but the batch has no sublane-aligned divisor
        for the Pallas stack kernel (supports_batch False — e.g. batch 3
        in f32 on real TPU, alignment 8/16 per dtype), this falls back to
        the math-identical XLA scan body instead of raising. The fallback
        only applies to per-frame streaming: fused_plan with
        chunk_frames > 1 is invalid for ANY batch (DefaultModel.stream
        raises)."""
        if fused_plan is not None and chunk_frames == 1:
            # alignment follows the ACTIVATION dtype the kernel sees —
            # derived as result_type(wav, params) rather than wav alone,
            # defensively: stream()'s supported contract is wav.dtype ==
            # params dtype, and under that contract the two agree
            act_dt = jnp.result_type(
                wav.dtype, jax.tree.leaves(variables["params"])[0].dtype)
            if not self._fused_batch_ok(int(wav.shape[0]), act_dt):
                fused_plan = None
        return super().stream(variables, wav, chunk_frames=chunk_frames,
                              unroll=unroll, fused_plan=fused_plan)

    def _block_fold(self, bp: Params, bs: Params) -> Params:
        eps = self.dp.eps
        nb: Params = {
            "trnn": self._plain_gru(bp["trnn"]),
            "frnn": {d: self._plain_gru(bp["frnn"][d]) for d in ("fwd", "bwd")},
            "trnn_fc": fold_fc_bn(bp["trnn_fc"], bp["trnn_post_norm"],
                                  bs["trnn_post_norm"], eps),
            "frnn_fc": fold_fc_bn(bp["frnn_fc"], bp["frnn_post_norm"],
                                  bs["frnn_post_norm"], eps),
            "trnn_post_norm": None,
            "frnn_post_norm": None,
        }
        if self.dp.pre_norm:
            nb["trnn"] = fold_prenorm_into_rnn(nb["trnn"], bs["trnn_pre_norm"],
                                               eps)
            nb["frnn"] = {d: fold_prenorm_into_rnn(nb["frnn"][d],
                                                   bs["frnn_pre_norm"], eps)
                          for d in ("fwd", "bwd")}
        return nb

    def torch_name(self, path: tp.Tuple[str, ...]) -> tp.Optional[str]:
        if path[0] == "rf_blocks":
            i, mod = path[1], path[2]
            prefix = f"dprnn_block.{i}"
            if mod == "trnn":
                leaf = path[3]
                sub = path[4] if len(path) > 4 else None
                if leaf.startswith("weight"):
                    if sub is None:
                        return f"{prefix}.trnn.{leaf}_l0"
                    which = "original0" if sub == "g" else "original1"
                    return f"{prefix}.trnn.parametrizations.{leaf}_l0.{which}"
                return f"{prefix}.trnn.{leaf}_l0"
            if mod == "frnn":
                direction, leaf = path[3], path[4]
                sub = path[5] if len(path) > 5 else None
                suffix = "_l0" if direction == "fwd" else "_l0_reverse"
                if leaf.startswith("weight"):
                    if sub is None:
                        return f"{prefix}.frnn.{leaf}{suffix}"
                    which = "original0" if sub == "g" else "original1"
                    return (f"{prefix}.frnn.parametrizations."
                            f"{leaf}{suffix}.{which}")
                return f"{prefix}.frnn.{leaf}{suffix}"
            return f"{prefix}.{mod}.{path[3]}"
        return super().torch_name(path)
