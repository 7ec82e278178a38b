"""BSRNN baseline: band-split RNN speech enhancement.

Reference: models/bsrnn/model.py (re-implementation of Yu et al., "High
fidelity speech enhancement with band-split RNN", Interspeech 2023):

  * 30-subband BandSplit — per-band BN over the (re,im)-interleaved bins +
    1x1 conv to C channels (:105-158);
  * num_layers x (pre-BN -> uni time-LSTM C->2C -> fc -> +skip;
    pre-BN -> bi freq-LSTM C->2C/dir -> fc 4C->C -> +skip) (:294-390);
  * per-band mask + residual GLU MLPs (:156-246);
  * full 257-bin compressed spectrum (no last-bin drop), complex mask
    multiply + residual add.

Deploy-time fold fuses the PRE-norms into the following conv/LSTM input
weights (fuse_bn_conv1d / fuse_bn_rnn, :14-84). Streaming carry = (h, c)
per time-LSTM.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from .. import nn as fnn
from ..functional import (
    STFTConfig,
    compress,
    uncompress,
    compressed_stft,
    compressed_istft,
    stft_streaming_step,
    istft_streaming_step,
    init_stft_carry,
    init_istft_carry,
)

Array = jax.Array
Params = tp.Dict[str, tp.Any]

SUBBANDS_512 = [2, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
                8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8,
                16, 16, 16, 16, 16, 16, 16, 17]  # sum == 257


class Model:
    _row_mask: tp.Optional[Array] = None
    def __init__(
        self,
        num_channels: int = 16,
        num_layers: int = 6,
        bias: bool = True,
        affine: bool = True,
        n_fft: int = 512,
        hop_size: int = 256,
        win_size: int = 512,
        window: str = "hann",
        input_compression: float = 0.3,
        stft_method: str = "fft",
    ):
        assert n_fft == 512, "reference BandSplit supports n_fft=512 only"
        self.subbands = list(SUBBANDS_512)
        self.channels = num_channels
        self.num_layers = num_layers
        self.bias = bias
        self.affine = affine
        self.n_fft = n_fft
        self.hop_size = hop_size
        self.input_compression = input_compression
        # stft_method="matmul": MXU windowed-DFT form, faster per frame
        # (same knob as the fastenhancer family; math-identical to fft)
        self.stft_cfg = STFTConfig(n_fft=n_fft, hop_size=hop_size,
                                   win_size=win_size, win_type=window,
                                   method=stft_method)
        self.n_bands = len(self.subbands)

    # -- init ---------------------------------------------------------------------

    def init(self, key: Array) -> tp.Dict[str, Params]:
        c = self.channels
        keys = iter(jax.random.split(key, 16 + 4 * self.num_layers
                                     + 4 * self.n_bands))
        params: Params = {}
        stats: Params = {}

        def bn(ch):
            return fnn.init_batch_norm(ch, affine=self.affine)

        params["band_split"], stats["band_split"] = [], []
        for sub in self.subbands:
            bn_p, bn_s = bn(sub * 2)
            fc = fnn.torch_conv1d_init(next(keys), c, sub * 2, 1, self.bias)
            params["band_split"].append({"norm": bn_p, "fc": fc})
            stats["band_split"].append({"norm": bn_s})

        params["layers"], stats["layers"] = [], []
        hdim = 2 * c
        for _ in range(self.num_layers):
            ks = jax.random.split(next(keys), 4)
            nt_p, nt_s = bn(c)
            nf_p, nf_s = bn(c)
            params["layers"].append({
                "norm_time": nt_p,
                "rnn_time": fnn.init_lstm(ks[0], c, hdim),
                "fc_time": fnn.torch_linear_init(ks[1], c, hdim, self.bias),
                "norm_freq": nf_p,
                "rnn_freq": fnn.init_bilstm(ks[2], c, hdim),
                "fc_freq": fnn.torch_linear_init(ks[3], c, 2 * hdim, self.bias),
            })
            stats["layers"].append({"norm_time": nt_s, "norm_freq": nf_s})

        params["mask_decoder"], stats["mask_decoder"] = [], []
        for sub in self.subbands:
            entry: Params = {}
            entry_s: Params = {}
            for which in ("mask", "residual"):
                bn_p, bn_s = fnn.init_batch_norm(c, affine=self.bias)
                ks = jax.random.split(next(keys), 2)
                entry[which] = {
                    "norm": bn_p,
                    "conv1": fnn.torch_conv1d_init(ks[0], 4 * c, c, 1, True),
                    "conv2": fnn.torch_conv1d_init(ks[1], sub * 4, 4 * c, 1,
                                                   True),
                }
                entry_s[which] = {"norm": bn_s}
            params["mask_decoder"].append(entry)
            stats["mask_decoder"].append(entry_s)
        return {"params": params, "stats": stats}

    # -- pieces -------------------------------------------------------------------

    def _band_groups(self) -> tp.List[tp.Tuple[int, int, int, int]]:
        """Consecutive runs of equal-width subbands: (band_idx0, n_bands,
        sub_width, bin_start). The 512-FFT layout yields 5 groups
        (widths 2/3/8/16/17), so the per-band work below runs as 5 batched
        einsums instead of 31 tiny convs."""
        if not hasattr(self, "_groups_cache"):
            groups = []
            i = bin0 = 0
            while i < self.n_bands:
                sub = self.subbands[i]
                j = i
                while j < self.n_bands and self.subbands[j] == sub:
                    j += 1
                groups.append((i, j - i, sub, bin0))
                bin0 += (j - i) * sub
                i = j
            self._groups_cache = groups
        return self._groups_cache

    @staticmethod
    def _bn_eval_grouped(x, ps, ss, key=None):
        """Eval-mode BN over a [B, g, T, ch] stack of g bands — same math as
        g independent fnn.batch_norm(train=False) calls (f32 norm, cast
        back). `key` indexes into nested {mask,residual} entries."""
        pick = (lambda e: e) if key is None else (lambda e: e[key])
        mean = jnp.stack([pick(s)["norm"]["mean"] for s in ss])
        var = jnp.stack([pick(s)["norm"]["var"] for s in ss])
        xf = x.astype(jnp.float32)
        y = (xf - mean[None, :, None, :]) * jax.lax.rsqrt(
            var[None, :, None, :].astype(jnp.float32) + 1e-5)
        if pick(ps[0])["norm"] is not None:
            w = jnp.stack([pick(p)["norm"]["weight"] for p in ps])
            b = jnp.stack([pick(p)["norm"]["bias"] for p in ps])
            y = y * w[None, :, None, :] + b[None, :, None, :]
        return y.astype(x.dtype)

    def _band_split_eval(self, params, stats, spec):
        """Math-identical grouped form of _band_split for train=False.

        BSRNN's per-frame streaming cost is op dispatch, not FLOPs: the loop
        form issues 31 tiny [B,T,sub*2]x[sub*2,C] convs per frame. Here each
        equal-width group runs as ONE batched einsum (weights stacked at
        trace time — loop-invariant, hoisted out of the streaming scan)."""
        b, f, t, _ = spec.shape
        outs = []
        for i0, g, sub, bin0 in self._band_groups():
            x = spec[:, bin0:bin0 + g * sub]            # [B, g*sub, T, 2]
            x = (x.reshape(b, g, sub, t, 2).transpose(0, 1, 3, 2, 4)
                 .reshape(b, g, t, sub * 2))            # [B, g, T, sub*2]
            ps = params[i0:i0 + g]
            ss = stats[i0:i0 + g]
            if ss[0].get("norm") is not None:           # folded: no norms
                x = self._bn_eval_grouped(x, ps, ss)
            wfc = jnp.stack([p["fc"]["weight"][:, :, 0] for p in ps])
            x = jnp.einsum("bgts,gcs->bgtc", x, wfc)    # [B, g, T, C]
            if "bias" in ps[0]["fc"]:
                x = x + jnp.stack([p["fc"]["bias"]
                                   for p in ps])[None, :, None, :]
            outs.append(x.transpose(0, 2, 1, 3))        # [B, T, g, C]
        x = jnp.concatenate(outs, axis=2)               # [B, T, F', C]
        return x.transpose(1, 0, 2, 3)                  # [T, B, F', C]

    def _mask_decoder_eval(self, params, stats, x):
        """Grouped form of _mask_decoder for train=False (see
        _band_split_eval): the C->4C conv1 batches over ALL 31 bands, the
        4C->sub*4 conv2 + GLU batch per equal-width group."""
        b, nb, c, t = x.shape
        xall = x.transpose(0, 1, 3, 2)                  # [B, F', T, C]
        outs = {}
        for which in ("mask", "residual"):
            y = xall
            if stats[0].get(which, {}).get("norm") is not None:
                y = self._bn_eval_grouped(y, params, stats, key=which)
            w1 = jnp.stack([p[which]["conv1"]["weight"][:, :, 0]
                            for p in params])           # [F', 4C, C]
            b1 = jnp.stack([p[which]["conv1"]["bias"] for p in params])
            y = jnp.einsum("bftc,fdc->bftd", y, w1) + b1[None, :, None, :]
            y = jnp.tanh(y)
            pieces = []
            for i0, g, sub, bin0 in self._band_groups():
                w2 = jnp.stack([p[which]["conv2"]["weight"][:, :, 0]
                                for p in params[i0:i0 + g]])  # [g, sub*4, 4C]
                b2 = jnp.stack([p[which]["conv2"]["bias"]
                                for p in params[i0:i0 + g]])
                z = (jnp.einsum("bgtd,gsd->bgts", y[:, i0:i0 + g], w2)
                     + b2[None, :, None, :])
                a, gate = jnp.split(z, 2, axis=-1)      # torch GLU(dim=1)
                z = a * jax.nn.sigmoid(gate)            # [B, g, T, sub*2]
                z = (z.reshape(b, g, t, sub, 2).transpose(0, 2, 1, 3, 4)
                     .reshape(b, t, g * sub, 2))
                pieces.append(z)
            outs[which] = jnp.concatenate(pieces, axis=2).transpose(0, 2, 1, 3)
        return outs["mask"], outs["residual"]

    def _band_split(self, params, stats, spec, train: bool):
        """spec [B, F, T, 2] -> ([T, B, F', C], new_stats list)."""
        b, f, t, _ = spec.shape
        out = []
        new_stats = []
        start = 0
        for p, s, sub in zip(params, stats, self.subbands):
            band = spec[:, start:start + sub]            # [B, sub, T, 2]
            # torch layout: reshape(B, sub*2, T) of [B, sub, 2, T]
            x = band.transpose(0, 1, 3, 2).reshape(b, sub * 2, t)
            x = x.transpose(0, 2, 1)                     # [B, T, sub*2]
            if s.get("norm") is not None:  # folded models have no norms
                x, bn_s = fnn.batch_norm(
                    p["norm"], s["norm"], x, train=train,
                    weight=None if self._row_mask is None
                    else self._row_mask[:, None, None])
                new_stats.append({"norm": bn_s})
            else:
                new_stats.append({})
            x = fnn.conv1d_cl(p["fc"], x)                # [B, T, C]
            out.append(x)
            start += sub
        x = jnp.stack(out, axis=2)                       # [B, T, F', C]
        return x.transpose(1, 0, 2, 3), new_stats        # [T, B, F', C]

    def _mask_decoder(self, params, stats, x, train: bool):
        """x [B, F', C, T] -> (mask [B, F, T, 2], res [B, F, T, 2], stats)."""
        b = x.shape[0]
        t = x.shape[3]
        masks, ress = [], []
        new_stats = []
        for i, (p, s, sub) in enumerate(zip(params, stats, self.subbands)):
            xb = x[:, i].transpose(0, 2, 1)              # [B, T, C]
            entry_s: Params = {}
            outs = {}
            for which in ("mask", "residual"):
                if s.get(which, {}).get("norm") is not None:
                    y, bn_s = fnn.batch_norm(
                        p[which]["norm"], s[which]["norm"], xb, train=train,
                        weight=None if self._row_mask is None
                        else self._row_mask[:, None, None])
                else:
                    y, bn_s = xb, None
                y = fnn.conv1d_cl(p[which]["conv1"], y)
                y = jnp.tanh(y)
                y = fnn.conv1d_cl(p[which]["conv2"], y)  # [B, T, sub*4]
                # GLU over the channel dim (torch GLU(dim=1) on [B, sub*4, T])
                a, g = jnp.split(y, 2, axis=-1)
                y = a * jax.nn.sigmoid(g)                # [B, T, sub*2]
                outs[which] = y.reshape(b, t, sub, 2)    # [B, T, sub, 2]
                if bn_s is not None:
                    entry_s[which] = {"norm": bn_s}
            masks.append(outs["mask"])
            ress.append(outs["residual"])
            new_stats.append(entry_s)
        mask = jnp.concatenate(masks, axis=2).transpose(0, 2, 1, 3)
        res = jnp.concatenate(ress, axis=2).transpose(0, 2, 1, 3)
        return mask, res, new_stats

    def model_forward(
        self, params: Params, stats: Params, spec: Array,
        h0: tp.Optional[tp.List] = None, train: bool = False,
    ) -> tp.Tuple[Array, tp.List, Params]:
        """Compressed spec [B, F, T, 2] -> (spec_hat, carry_out, new_stats)."""
        new_stats = jax.tree.map(lambda x: x, stats)
        if train:
            x, bs_stats = self._band_split(params["band_split"],
                                           stats["band_split"], spec, train)
            new_stats["band_split"] = bs_stats
        else:
            x = self._band_split_eval(params["band_split"],
                                      stats["band_split"], spec)
        t, b, f, c = x.shape
        bw_tb = (None if self._row_mask is None
                 else self._row_mask[None, :, None, None])

        carry_out = []
        for i, (p, s) in enumerate(zip(params["layers"], stats["layers"])):
            skip = x
            if s.get("norm_time") is not None:
                y, bn_s = fnn.batch_norm(
                    p["norm_time"], s["norm_time"], x, train=train,
                    weight=bw_tb)
            else:
                y, bn_s = x, None
            y = y.reshape(t, b * f, c)
            hc = None if h0 is None else h0[i]
            y, hc_out = fnn.lstm(p["rnn_time"], y, hc)
            carry_out.append(hc_out)
            y = fnn.linear(p["fc_time"], y)
            x = y.reshape(t, b, f, c) + skip
            if train and bn_s is not None:
                new_stats["layers"][i]["norm_time"] = bn_s

            skip = x
            if s.get("norm_freq") is not None:
                y, bn_s = fnn.batch_norm(
                    p["norm_freq"], s["norm_freq"], x, train=train,
                    weight=bw_tb)
            else:
                y, bn_s = x, None
            y = y.reshape(t * b, f, c).swapaxes(0, 1)    # [F, T*B, C]
            y = fnn.bilstm(p["rnn_freq"], y)             # [F, T*B, 4C]
            y = y.swapaxes(0, 1).reshape(t, b, f, 4 * c)
            y = fnn.linear(p["fc_freq"], y)
            x = y + skip
            if train and bn_s is not None:
                new_stats["layers"][i]["norm_freq"] = bn_s

        x = x.transpose(1, 2, 3, 0)                      # [B, F', C, T]
        if train:
            mask, res, md_stats = self._mask_decoder(
                params["mask_decoder"], stats["mask_decoder"], x, train)
            new_stats["mask_decoder"] = md_stats
        else:
            mask, res = self._mask_decoder_eval(
                params["mask_decoder"], stats["mask_decoder"], x)
        re = spec[..., 0] * mask[..., 0] - spec[..., 1] * mask[..., 1]
        im = spec[..., 0] * mask[..., 1] + spec[..., 1] * mask[..., 0]
        spec_hat = jnp.stack([re, im], axis=3) + res
        return spec_hat, carry_out, new_stats

    # -- training graph -------------------------------------------------------------

    def stft(self, wav: Array) -> Array:
        return compressed_stft(wav, self.stft_cfg, self.input_compression)

    def forward(self, variables: Params, wav: Array, train: bool = False,
                row_mask: tp.Optional[Array] = None,
                ) -> tp.Tuple[Array, Array, Params]:
        """row_mask [B] excludes zero-padded batch rows from train-mode BN
        statistics (see nn.batch_norm)."""
        params, stats = variables["params"], variables["stats"]
        self._row_mask = row_mask if train else None
        try:
            spec = compressed_stft(wav, self.stft_cfg, self.input_compression)
            spec_hat, _, new_stats = self.model_forward(params, stats, spec,
                                                        train=train)
            wav_hat = compressed_istft(spec_hat, self.stft_cfg,
                                       self.input_compression,
                                       length=wav.shape[-1])
        finally:
            self._row_mask = None
        return wav_hat, spec_hat, new_stats

    # -- streaming -----------------------------------------------------------------

    def init_streaming_carry(self, batch: int, dtype=jnp.float32,
                             fused: bool = False) -> Params:
        hdim = 2 * self.channels
        if fused:
            # stacked f-major layout for the fused band-stack kernel
            # (ops/bsrnn_stack.py): [L, 2(h,c), F, B, H]
            h = jnp.zeros((self.num_layers, 2, self.n_bands, batch, hdim),
                          dtype)
        else:
            h = [(jnp.zeros((batch * self.n_bands, hdim), dtype),
                  jnp.zeros((batch * self.n_bands, hdim), dtype))
                 for _ in range(self.num_layers)]
        return {
            "stft": init_stft_carry(self.stft_cfg, batch, dtype),
            "istft": init_istft_carry(self.stft_cfg, batch, dtype),
            "h": h,
        }

    def streaming_step(self, variables: Params, carry: Params, wav_hop: Array
                       ) -> tp.Tuple[Params, Array]:
        params, stats = variables["params"], variables["stats"]
        spec, stft_c = stft_streaming_step(wav_hop, carry["stft"],
                                           self.stft_cfg)
        spec = compress(spec[:, :, None, :], self.input_compression)
        spec_hat, h_out, _ = self.model_forward(params, stats, spec,
                                                h0=carry["h"], train=False)
        spec_hat = uncompress(spec_hat, self.input_compression)[:, :, 0, :]
        wav_out, istft_c = istft_streaming_step(spec_hat, carry["istft"],
                                                self.stft_cfg)
        return {"stft": stft_c, "istft": istft_c, "h": h_out}, wav_out

    def build_stack_plan(self, variables: Params, dtype=None) -> Params:
        """Kernel-ready stacked weights for the fused per-frame band-stack
        kernel (ops/bsrnn_stack.py). Requires fold() output (pre-norm BNs
        already fused into the LSTM input weights)."""
        layers = variables["params"]["layers"]
        if layers and layers[0].get("norm_time") is not None:
            raise ValueError("build_stack_plan expects fold() output")
        from ..ops.bsrnn_stack import plan_band_stack

        return plan_band_stack(layers, dtype)

    def streaming_step_fused(self, variables: Params, plan: Params,
                             carry: Params, wav_hop: Array
                             ) -> tp.Tuple[Params, Array]:
        """streaming_step with the whole 6-layer dual-path LSTM stack as ONE
        Pallas program (ops/bsrnn_stack.py) — the per-frame hot spot is the
        6 x (1 + n_bands) sequential recurrence steps whose per-op issue
        latency, not FLOPs, sets the frame time. Math matches
        streaming_step on folded variables (tested). carry["h"] uses the
        stacked f-major layout (init_streaming_carry(fused=True))."""
        from ..ops.bsrnn_stack import bsrnn_stack_step

        params, stats = variables["params"], variables["stats"]
        spec, stft_c = stft_streaming_step(wav_hop, carry["stft"],
                                           self.stft_cfg)
        spec = compress(spec[:, :, None, :], self.input_compression)
        x = self._band_split_eval(params["band_split"],
                                  stats["band_split"], spec)  # [1, B, F, C]
        xf = jnp.swapaxes(x[0], 0, 1)                         # [F, B, C]
        xf, h_new = bsrnn_stack_step(plan, xf, carry["h"])
        x = jnp.swapaxes(xf, 0, 1)[None]                      # [1, B, F, C]
        x = x.transpose(1, 2, 3, 0)                           # [B, F, C, 1]
        mask, res = self._mask_decoder_eval(params["mask_decoder"],
                                            stats["mask_decoder"], x)
        re = spec[..., 0] * mask[..., 0] - spec[..., 1] * mask[..., 1]
        im = spec[..., 0] * mask[..., 1] + spec[..., 1] * mask[..., 0]
        spec_hat = jnp.stack([re, im], axis=3) + res
        spec_hat = uncompress(spec_hat, self.input_compression)[:, :, 0, :]
        wav_out, istft_c = istft_streaming_step(spec_hat, carry["istft"],
                                                self.stft_cfg)
        return {"stft": stft_c, "istft": istft_c, "h": h_new}, wav_out

    def streaming_chunk(self, variables: Params, carry: Params,
                        wav_chunk: Array) -> tp.Tuple[Params, Array]:
        """C hops in/out — identical math to C single-hop steps with the
        network time-batched over the chunk (throughput streaming form)."""
        from ..functional import stft_streaming_chunk, istft_streaming_chunk

        params, stats = variables["params"], variables["stats"]
        spec, stft_c = stft_streaming_chunk(wav_chunk, carry["stft"],
                                            self.stft_cfg)
        spec = compress(spec, self.input_compression)  # [B, F, C, 2]
        spec_hat, h_out, _ = self.model_forward(params, stats, spec,
                                                h0=carry["h"], train=False)
        spec_hat = uncompress(spec_hat, self.input_compression)
        wav_out, istft_c = istft_streaming_chunk(spec_hat, carry["istft"],
                                                 self.stft_cfg)
        return {"stft": stft_c, "istft": istft_c, "h": h_out}, wav_out

    def _fused_batch_ok(self, batch: int, dtype) -> bool:
        """Single source of truth for the fused kernel's batch-tile check
        (consulted by both stream()'s fallback and validate_fused_batch —
        the kernel-shape argument list lives only here). dtype must be the
        ACTIVATION dtype the kernel will see (band_split output), not
        necessarily the wav dtype."""
        from ..ops.bsrnn_stack import supports_batch

        return supports_batch(batch, self.n_bands, self.channels,
                              2 * self.channels, self.num_layers,
                              jnp.dtype(dtype).itemsize)

    def validate_fused_batch(self, batch: int, dtype=jnp.float32) -> None:
        """Raise early (with guidance) when a fused serving batch has no
        sublane-aligned kernel tile — called by StreamingEngine(fused=True)
        at construction (per shard when devices>1) and by bench.py before
        labelling a run fused. stream() instead falls back to XLA
        silently."""
        if not self._fused_batch_ok(batch, dtype):
            raise ValueError(
                f"fused bsrnn serving needs a sublane-aligned capacity "
                f"(multiple of 8 for f32 / 16 for bf16 with a tile fitting "
                f"VMEM); capacity {batch} with dtype {jnp.dtype(dtype).name} "
                f"has none — use an aligned capacity or fused=False")

    def stream(self, variables: Params, wav: Array,
               chunk_frames: int = 1, unroll: int = 4,
               fused_plan: tp.Optional[Params] = None) -> Array:
        b, length = wav.shape
        hop = self.hop_size
        t = length // hop
        if fused_plan is not None:
            if chunk_frames > 1:
                raise ValueError(
                    "fused_plan implies per-frame streaming "
                    "(chunk_frames=1); the chunked form time-batches the "
                    "stack in XLA already")
            # A batch with no sublane-aligned kernel tile falls back to
            # the math-identical XLA scan body instead of raising. The
            # alignment follows the ACTIVATION dtype the kernel sees —
            # derived as result_type(wav, params) rather than wav alone,
            # defensively: stream()'s supported contract is wav.dtype ==
            # params dtype (a mixed pair fails the XLA scan carry check
            # too), and under that contract the two derivations agree.
            act_dt = jnp.result_type(
                wav.dtype, jax.tree.leaves(variables["params"])[0].dtype)
            if not self._fused_batch_ok(b, act_dt):
                fused_plan = None
        if fused_plan is not None:
            hops = wav[:, : t * hop].reshape(b, t, hop).swapaxes(0, 1)

            def fstep(carry, x):
                carry, y = self.streaming_step_fused(variables, fused_plan,
                                                     carry, x)
                return carry, y

            _, outs = jax.lax.scan(
                fstep, self.init_streaming_carry(b, wav.dtype, fused=True),
                hops, unroll=unroll)
            return outs.swapaxes(0, 1).reshape(b, -1)
        if chunk_frames > 1:
            t = (t // chunk_frames) * chunk_frames
            blocks = wav[:, : t * hop].reshape(
                b, t // chunk_frames, hop * chunk_frames).swapaxes(0, 1)

            def cstep(carry, x):
                carry, y = self.streaming_chunk(variables, carry, x)
                return carry, y

            _, outs = jax.lax.scan(
                cstep, self.init_streaming_carry(b, wav.dtype), blocks,
                unroll=unroll)
            return outs.swapaxes(0, 1).reshape(b, -1)
        hops = wav[:, : t * hop].reshape(b, t, hop).swapaxes(0, 1)

        def step(carry, x):
            carry, y = self.streaming_step(variables, carry, x)
            return carry, y

        _, outs = jax.lax.scan(step, self.init_streaming_carry(b, wav.dtype),
                               hops, unroll=unroll)
        return outs.swapaxes(0, 1).reshape(b, -1)

    # -- deploy-time folding ----------------------------------------------------------

    def fold(self, variables: Params) -> Params:
        """Fuse the PRE-norm BNs into the following conv/LSTM input weights
        (reference: models/bsrnn/model.py:14-84)."""
        params = variables["params"]
        stats = variables["stats"]
        eps = 1e-5

        def bn_wb(bn_p, bn_s):
            std = jnp.sqrt(bn_s["var"] + eps)
            w = 1.0 / std
            b = -bn_s["mean"] / std
            if bn_p is not None:
                w = bn_p["weight"] * w
                b = b * bn_p["weight"] + bn_p["bias"]
            return w, b

        def fuse_conv(conv, bn_p, bn_s):
            w, b = bn_wb(bn_p, bn_s)
            weight = conv["weight"] * w[None, :, None]
            bias = jnp.sum(conv["weight"] * b[None, :, None], axis=(1, 2))
            if "bias" in conv:
                bias = bias + conv["bias"]
            return {"weight": weight, "bias": bias}

        def fuse_lstm(rnn, bn_p, bn_s):
            w, b = bn_wb(bn_p, bn_s)
            out = dict(rnn)
            out["bias_ih"] = rnn["bias_ih"] + rnn["weight_ih"] @ b
            out["weight_ih"] = rnn["weight_ih"] * w
            return out

        out: Params = {"band_split": [], "layers": [], "mask_decoder": []}
        for p, s in zip(params["band_split"], stats["band_split"]):
            out["band_split"].append({
                "norm": None,
                "fc": fuse_conv(p["fc"], p["norm"], s["norm"])})
        for p, s in zip(params["layers"], stats["layers"]):
            rnn_f = {d: fuse_lstm(p["rnn_freq"][d], p["norm_freq"],
                                  s["norm_freq"]) for d in ("fwd", "bwd")}
            out["layers"].append({
                "norm_time": None,
                "rnn_time": fuse_lstm(p["rnn_time"], p["norm_time"],
                                      s["norm_time"]),
                "fc_time": p["fc_time"],
                "norm_freq": None,
                "rnn_freq": rnn_f,
                "fc_freq": p["fc_freq"],
            })
        for p, s in zip(params["mask_decoder"], stats["mask_decoder"]):
            entry = {}
            for which in ("mask", "residual"):
                entry[which] = {
                    "norm": None,
                    "conv1": fuse_conv(p[which]["conv1"], p[which]["norm"],
                                       s[which]["norm"]),
                    "conv2": p[which]["conv2"],
                }
            out["mask_decoder"].append(entry)

        def empty(tree):
            if isinstance(tree, list):
                return [empty(x) for x in tree]
            if isinstance(tree, dict):
                return {k: empty(v) for k, v in tree.items()
                        if not (k == "norm" or k.startswith("norm_"))}
            return tree

        folded_stats = {"band_split": [{} for _ in self.subbands],
                        "layers": [{} for _ in range(self.num_layers)],
                        "mask_decoder": [{} for _ in self.subbands]}
        return {"params": out, "stats": folded_stats}

    # -- misc --------------------------------------------------------------------------

    def torch_name(self, path: tp.Tuple[str, ...]) -> tp.Optional[str]:
        head = path[0]
        if head == "band_split":
            i, mod, leaf = path[1], path[2], path[3]
            attr = "norm" if mod == "norm" else "fc"
            return f"band_split.{attr}.{i}.{leaf}"
        if head == "layers":
            i, mod = path[1], path[2]
            if mod == "rnn_time":
                return f"rnn_time.{i}.{path[3]}_l0"
            if mod == "rnn_freq":
                d, leaf = path[3], path[4]
                sfx = "_l0" if d == "fwd" else "_l0_reverse"
                return f"rnn_freq.{i}.{leaf}{sfx}"
            return f"{mod}.{i}.{path[3]}"
        if head == "mask_decoder":
            i, which, mod, leaf = path[1], path[2], path[3], path[4]
            seq = {"norm": 0, "conv1": 1, "conv2": 3}[mod]
            name = "mlp_mask" if which == "mask" else "mlp_residual"
            return f"mask_decoder.{name}.{i}.{seq}.{leaf}"
        raise KeyError(f"unmapped bsrnn param path: {path}")

    def fixed_param_paths(self) -> tp.List[tp.Tuple[str, ...]]:
        return []

    def num_params(self, params: Params) -> int:
        return sum(l.size for l in jax.tree.leaves(params))
