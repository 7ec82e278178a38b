"""FSPEN baseline: full-band + sub-band dual-path enhancement.

Reference: models/fspen/model.py (re-implementation of FSPEN, ICASSP 2024):

  * magnitude sub-band encoder: 5 strided convs over overlapping bin ranges
    (:39-66) producing a 32-bin sub-band feature;
  * full-band conv encoder over (re, im) with BN+ELU (:229-243);
  * feature merge -> N x DPE blocks (time bi-GRU intra + grouped uni freq
    inter GRU with per-group hidden caches, :98-188) -> feature split;
  * sub-band decoder with overlapping per-range linears (:69-95), full-band
    skip-concat transposed-conv decoder (:262-278);
  * magnitude mask = (sub + |full|)/2 applied on the full complex mask
    direction (:376-381).

Streaming carry = groups x num_blocks inter-GRU hiddens.
"""
from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from .. import nn as fnn
from ..functional import (
    STFTConfig, compress, uncompress, compressed_stft, compressed_istft,
    stft_streaming_step, istft_streaming_step, init_stft_carry,
    init_istft_carry,
)

Array = jax.Array
Params = tp.Dict[str, tp.Any]

# sub-band encoder geometry (reference :59-66):
# (input slice start, end, left pad, right pad, kernel, stride)
SUB_ENC = [
    (0, 17, 1, 0, 4, 2),     # -> 8 bins
    (13, 35, 0, 0, 7, 3),    # -> 6
    (30, 66, 0, 0, 11, 5),   # -> 6
    (61, 131, 0, 0, 20, 10),  # -> 6
    (122, 257, 0, 5, 40, 20),  # -> 6
]
# sub-band decoder geometry (reference :87-95):
# (feature slice start, end, pad rows, out per row, trim start, trim end)
SUB_DEC = [
    (0, 8, 0, 2, 0, 16),
    (8, 14, 0, 3, 1, 17),
    (13, 21, 0, 5, 4, 36),
    (19, 27, 0, 10, 8, 72),
    (25, 32, 1, 20, 16, 145),
]


@dataclasses.dataclass
class DPEConfig:
    num_blocks: int = 3
    channels: int = 16
    freq: int = 32
    groups: int = 8
    norm: str = "LayerNorm-FreqChannels"


def _elu(x):
    return jax.nn.elu(x)


class Model:
    _row_mask: tp.Optional[Array] = None
    def __init__(
        self,
        channels: tp.Sequence[int] = (4, 16, 32),
        kernel_size: tp.Sequence[int] = (6, 8, 6),
        stride: tp.Sequence[int] = (2, 2, 2),
        dpe_kwargs: tp.Optional[tp.Dict[str, tp.Any]] = None,
        n_fft: int = 512,
        hop_size: int = 256,
        win_size: int = 512,
        window: str = "hann",
        input_compression: float = 0.3,
        stft_method: str = "fft",
    ):
        assert n_fft == 512
        self.channels = list(channels)
        self.kernel_size = list(kernel_size)
        self.stride = list(stride)
        self.dpe = DPEConfig(**(dpe_kwargs or {}))
        self.n_fft = n_fft
        self.hop_size = hop_size
        self.input_compression = input_compression
        # stft_method="matmul" runs the window+DFT as one MXU matmul — the
        # faster form for per-frame streaming (same knob as the fastenhancer
        # family; math-identical to fft within float tolerance)
        self.stft_cfg = STFTConfig(n_fft=n_fft, hop_size=hop_size,
                                   win_size=win_size, win_type=window,
                                   method=stft_method)

    # -- init ----------------------------------------------------------------------

    def init(self, key: Array) -> tp.Dict[str, Params]:
        dpe = self.dpe
        keys = iter(jax.random.split(key, 64))
        params: Params = {}
        stats: Params = {}

        c_out = self.channels[-1]
        params["subband_encoder"] = [
            fnn.torch_conv1d_init(next(keys), c_out, 1, k, True)
            for (_, _, _, _, k, _) in SUB_ENC]
        params["subband_decoder"] = [
            fnn.torch_linear_init(next(keys), out, c_out * 2, True)
            for (_, _, _, out, _, _) in SUB_DEC]

        params["fullband_encoder"], stats["fullband_encoder"] = [], []
        for i, (k, c) in enumerate(zip(self.kernel_size, self.channels)):
            cin = 2 if i == 0 else self.channels[i - 1]
            conv = fnn.torch_conv1d_init(next(keys), c, cin, k, False)
            bn_p, bn_s = fnn.init_batch_norm(c)
            params["fullband_encoder"].append({"conv": conv, "bn": bn_p})
            stats["fullband_encoder"].append({"bn": bn_s})
        params["fullband_encoder_post"] = fnn.torch_conv1d_init(
            next(keys), c_out, c_out, 1, False)

        params["feature_merge"] = {
            "lin": fnn.torch_linear_init(next(keys), dpe.freq, 64, False),
            "conv": fnn.torch_conv1d_init(next(keys), dpe.channels, c_out, 1,
                                          True),
        }

        params["dpe_blocks"], stats["dpe_blocks"] = [], []
        for _ in range(dpe.num_blocks):
            ks = jax.random.split(next(keys), 2 + 2 * dpe.groups)
            bp: Params = {
                "intra_rnn": fnn.init_bigru(ks[0], dpe.channels, dpe.channels),
                "intra_fc": fnn.torch_linear_init(ks[1], dpe.channels,
                                                  2 * dpe.channels, True),
                "intra_ln": {
                    "weight": jnp.ones((dpe.freq, dpe.channels)),
                    "bias": jnp.zeros((dpe.freq, dpe.channels)),
                },
                "inter_rnn": [fnn.init_gru(ks[2 + 2 * g], dpe.channels,
                                           dpe.channels)
                              for g in range(dpe.groups)],
                "inter_fc": [fnn.torch_linear_init(ks[3 + 2 * g], dpe.channels,
                                                   dpe.channels, True)
                             for g in range(dpe.groups)],
            }
            params["dpe_blocks"].append(bp)
            stats["dpe_blocks"].append({})

        params["feature_split"] = {
            "conv": fnn.torch_conv1d_init(next(keys), c_out, dpe.channels, 1,
                                          True),
            "lin": fnn.torch_linear_init(next(keys), 64, dpe.freq, False),
        }

        params["fullband_decoder"], stats["fullband_decoder"] = [], []
        for idx, i in enumerate(range(len(self.channels) - 1, -1, -1)):
            cin = self.channels[i]
            cout = 2 if i == 0 else self.channels[i - 1]
            conv1 = fnn.torch_conv1d_init(next(keys), cin, 2 * cin, 1, False)
            convt = fnn.torch_convtranspose1d_init(
                next(keys), cin, cout, self.kernel_size[i], bias=(i == 0))
            unit: Params = {"conv1": conv1, "convt": convt}
            st: Params = {}
            if i != 0:
                bn_p, bn_s = fnn.init_batch_norm(cout)
                unit["bn"] = bn_p
                st["bn"] = bn_s
            params["fullband_decoder"].append(unit)
            stats["fullband_decoder"].append(st)
        return {"params": params, "stats": stats}

    # -- pieces ---------------------------------------------------------------------

    def _subband_encode(self, params, mag):
        """mag: [N, F=257] -> [N, 32, C] (channels-last)."""
        outs = []
        for p, (s, e, pl, pr, k, st) in zip(params, SUB_ENC):
            x = mag[:, s:e]
            if pl or pr:
                x = jnp.pad(x, ((0, 0), (pl, pr)))
            y = fnn.conv1d_cl(p, x[:, :, None], stride=st)  # [N, F', C]
            outs.append(jax.nn.relu(y))
        return jnp.concatenate(outs, axis=1)  # [N, 32, C]

    def _subband_decode(self, params, x):
        """x: [N, 32, 2C] -> [N, 257] magnitude mask."""
        outs = []
        n = x.shape[0]
        for p, (s, e, pad, _, ts, te) in zip(params, SUB_DEC):
            xi = x[:, s:e]
            if pad:
                xi = jnp.pad(xi, ((0, 0), (0, pad), (0, 0)))
            y = jax.nn.relu(fnn.linear(p, xi))  # [N, rows, out]
            y = y.reshape(n, -1)[:, ts:te]
            outs.append(y)
        return jnp.concatenate(outs, axis=1)

    def _dpe_block(self, p: Params, x: Array, h0) -> tp.Tuple[Array, tp.List]:
        """x: [T, B, F, C]; h0: list of per-group hiddens or None."""
        dpe = self.dpe
        t, b, f, c = x.shape

        # intra: bidirectional GRU over freq within each frame
        x_in = x
        y = x.reshape(t * b, f, c).swapaxes(0, 1)  # [F, T*B, C]
        y = fnn.bigru(p["intra_rnn"], y)
        y = y.swapaxes(0, 1).reshape(t, b, f, 2 * c)
        y = fnn.linear(p["intra_fc"], y)
        # LayerNorm over [F, C] with elementwise affine [F, C]
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(-2, -1), keepdims=True)
        var = jnp.var(yf, axis=(-2, -1), keepdims=True)
        y = ((yf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(y.dtype)
        y = y * p["intra_ln"]["weight"] + p["intra_ln"]["bias"]
        x = y + x_in

        # inter: grouped uni GRU over time
        x_in = x
        fg = f // dpe.groups
        outs = []
        h_out = []
        for g in range(dpe.groups):
            xg = x[:, :, g * fg:(g + 1) * fg].reshape(t, b * fg, c)
            hg = None if h0 is None else h0[g]
            yg, h_t = fnn.gru(p["inter_rnn"][g], xg, hg)
            h_out.append(h_t)
            yg = fnn.linear(p["inter_fc"][g], yg)
            outs.append(yg.reshape(t, b, fg, c))
        # NOTE: the reference adds the inter residual TWICE — once inside
        # InterRNNPathExtension.forward (:139) and once more in DPE.forward
        # (:188). Replicated literally; checkpoints were trained with it.
        x = jnp.concatenate(outs, axis=2) + 2.0 * x_in
        return x, h_out

    def model_forward(self, params: Params, stats: Params, spec: Array,
                      h0=None, train: bool = False):
        """Compressed spec [B, F=257, T, 2] -> (spec_hat, carry, new_stats)."""
        dpe = self.dpe
        b, f0, t, _ = spec.shape
        new_stats = jax.tree.map(lambda x: x, stats)
        bw = (None if self._row_mask is None else
              jnp.repeat(self._row_mask.astype(jnp.float32),
                         t)[:, None, None])

        x = spec.transpose(0, 2, 1, 3).reshape(b * t, f0, 2)  # [BT, F, 2]
        mag = jnp.linalg.norm(x, axis=2)  # [BT, F]

        x_sub1 = self._subband_encode(params["subband_encoder"], mag)

        enc_out = []
        for i, (p, s) in enumerate(zip(params["fullband_encoder"],
                                       stats["fullband_encoder"])):
            k, st = self.kernel_size[i], self.stride[i]
            x = fnn.conv1d_cl(p["conv"], x, stride=st, padding=(k - st) // 2)
            if s.get("bn") is not None:  # folded models have BN fused away
                x, bn_s = fnn.batch_norm(p["bn"], s["bn"], x, train=train,
                                         weight=bw)
                if train:
                    new_stats["fullband_encoder"][i] = {"bn": bn_s}
            x = _elu(x)
            enc_out.append(x)
        x = fnn.conv1d_cl(params["fullband_encoder_post"], x)  # [BT, 32, C]

        # feature merge: concat on freq -> linear over freq -> 1x1 conv
        x = jnp.concatenate([x, x_sub1], axis=1)  # [BT, 64, C]
        w = params["feature_merge"]["lin"]["weight"]  # [freq, 64]
        x = jnp.einsum("oF,nFc->noc", w, x)
        x = _elu(x)
        x = fnn.conv1d_cl(params["feature_merge"]["conv"], x)  # [BT, freq, C']

        xb = x.reshape(b, t, dpe.freq, dpe.channels).transpose(1, 0, 2, 3)
        carry_out = []
        for i, p in enumerate(params["dpe_blocks"]):
            hi = None if h0 is None else h0[i]
            xb, h_out = self._dpe_block(p, xb, hi)
            carry_out.append(h_out)
        x = xb.transpose(1, 0, 2, 3).reshape(b * t, dpe.freq, dpe.channels)

        # feature split: 1x1 conv -> linear freq->64 -> ELU
        x = fnn.conv1d_cl(params["feature_split"]["conv"], x)  # [BT, freq, C]
        w = params["feature_split"]["lin"]["weight"]  # [64, freq]
        x = jnp.einsum("oF,nFc->noc", w, x)
        x = _elu(x)  # [BT, 64, C]
        x_full, x_sub2 = x[:, :32], x[:, 32:]

        mask_sub = self._subband_decode(
            params["subband_decoder"],
            jnp.concatenate([x_sub1, x_sub2], axis=2))  # [BT, 257]
        mask_sub = mask_sub.reshape(b, t, f0).transpose(0, 2, 1)[..., None]

        x = x_full
        for i, (p, s) in enumerate(zip(params["fullband_decoder"],
                                       stats["fullband_decoder"])):
            ci = len(self.channels) - 1 - i
            k, st = self.kernel_size[ci], self.stride[ci]
            x = jnp.concatenate([x, enc_out.pop()], axis=2)
            x = fnn.conv1d_cl(p["conv1"], x)
            pad = (k - st) // 2
            x = fnn.conv_transpose1d_cl(p["convt"], x, stride=st, padding=pad,
                                        output_padding=1 if ci == 0 else 0)
            if p.get("bn") is not None and s.get("bn") is not None:
                x, bn_s = fnn.batch_norm(p["bn"], s["bn"], x, train=train,
                                         weight=bw)
                if train:
                    new_stats["fullband_decoder"][i] = {"bn": bn_s}
                x = _elu(x)
            elif ci != 0:  # folded: BN fused into convt, activation remains
                x = _elu(x)
        mask_full = x.reshape(b, t, f0, 2).transpose(0, 2, 1, 3)  # [B,F,T,2]

        re = spec[..., 0] * mask_full[..., 0] - spec[..., 1] * mask_full[..., 1]
        im = spec[..., 0] * mask_full[..., 1] + spec[..., 1] * mask_full[..., 0]
        out_full = jnp.stack([re, im], axis=3)
        mask_full_mag = jnp.linalg.norm(mask_full, axis=-1, keepdims=True)
        mask_mag = (mask_sub + mask_full_mag) * 0.5
        spec_out = out_full / mask_full_mag * mask_mag
        return spec_out, carry_out, new_stats

    # -- training graph ----------------------------------------------------------------

    def stft(self, wav: Array) -> Array:
        return compressed_stft(wav, self.stft_cfg, self.input_compression)

    def forward(self, variables: Params, wav: Array, train: bool = False,
                row_mask: tp.Optional[Array] = None):
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

    # -- streaming ----------------------------------------------------------------------

    def init_streaming_carry(self, batch: int, dtype=jnp.float32) -> Params:
        dpe = self.dpe
        fg = dpe.freq // dpe.groups
        return {
            "stft": init_stft_carry(self.stft_cfg, batch, dtype),
            "istft": init_istft_carry(self.stft_cfg, batch, dtype),
            "h": [[jnp.zeros((batch * fg, dpe.channels), dtype)
                   for _ in range(dpe.groups)]
                  for _ in range(dpe.num_blocks)],
        }

    def streaming_step(self, variables: Params, carry: Params, wav_hop: Array):
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

    def stream(self, variables: Params, wav: Array,
               chunk_frames: int = 1, unroll: int = 4) -> Array:
        b, length = wav.shape
        hop = self.hop_size
        t = length // hop
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

    # -- fold ---------------------------------------------------------------------------

    def fold(self, variables: Params) -> Params:
        """Merge BN into the preceding convs (reference: :299-343)."""
        params = variables["params"]
        stats = variables["stats"]
        eps = 1e-5
        out = jax.tree.map(lambda x: x, params, is_leaf=lambda x: x is None)

        new_enc = []
        for p, s in zip(params["fullband_encoder"], stats["fullband_encoder"]):
            std = jnp.sqrt(s["bn"]["var"] + eps)
            g = p["bn"]["weight"] / std
            new_enc.append({"conv": {
                "weight": p["conv"]["weight"] * g[:, None, None],
                "bias": p["bn"]["bias"] - s["bn"]["mean"] * g}, "bn": None})
        out["fullband_encoder"] = new_enc
        new_dec = []
        for p, s in zip(params["fullband_decoder"], stats["fullband_decoder"]):
            unit = dict(p)
            if "bn" in p and p["bn"] is not None and "bn" in s:
                std = jnp.sqrt(s["bn"]["var"] + eps)
                g = p["bn"]["weight"] / std
                # convT weight [Cin, Cout, k]: scale output channels
                unit["convt"] = {
                    "weight": p["convt"]["weight"] * g[None, :, None],
                    "bias": p["bn"]["bias"] - s["bn"]["mean"] * g}
                unit["bn"] = None
            new_dec.append(unit)
        out["fullband_decoder"] = new_dec
        folded_stats = {"fullband_encoder": [{} for _ in self.channels],
                        "fullband_decoder": [{} for _ in self.channels],
                        "dpe_blocks": [{} for _ in range(self.dpe.num_blocks)]}
        return {"params": out, "stats": folded_stats}

    # -- misc ----------------------------------------------------------------------------

    def torch_name(self, path: tp.Tuple[str, ...]) -> tp.Optional[str]:
        head = path[0]
        if head == "subband_encoder":
            return f"subband_encoder.conv{int(path[1]) + 1}.0.{path[2]}"
        if head == "subband_decoder":
            return f"subband_decoder.lin{int(path[1]) + 1}.0.{path[2]}"
        if head == "fullband_encoder":
            i, mod, leaf = path[1], path[2], path[3]
            idx = 0 if mod == "conv" else 1
            return f"fullband_encoder.{i}.{idx}.{leaf}"
        if head == "fullband_encoder_post":
            return f"fullband_encoder_post.{path[1]}"
        if head == "feature_merge":
            idx = {"lin": 0, "conv": 2}[path[1]]
            return f"feature_merge.{idx}.{path[2]}"
        if head == "feature_split":
            idx = {"conv": 0, "lin": 1}[path[1]]
            return f"feature_split.{idx}.{path[2]}"
        if head == "dpe_blocks":
            i, mod = path[1], path[2]
            prefix = f"dpe_blocks.{i}"
            if mod == "intra_rnn":
                d, leaf = path[3], path[4]
                sfx = "_l0" if d == "fwd" else "_l0_reverse"
                return f"{prefix}.intra_rnn.{leaf}{sfx}"
            if mod == "intra_fc":
                return f"{prefix}.intra_fc.{path[3]}"
            if mod == "intra_ln":
                return f"{prefix}.intra_ln.{path[3]}"
            if mod == "inter_rnn":
                g, leaf = path[3], path[4]
                return f"{prefix}.inter_rnn.inter_rnn.{g}.{leaf}_l0"
            if mod == "inter_fc":
                g, leaf = path[3], path[4]
                return f"{prefix}.inter_rnn.inter_fc.{g}.{leaf}"
        if head == "fullband_decoder":
            i, mod, leaf = path[1], path[2], path[3]
            idx = {"conv1": 0, "convt": 1, "bn": 2}[mod]
            return f"fullband_decoder.{i}.{idx}.{leaf}"
        raise KeyError(f"unmapped fspen param path: {path}")

    def fixed_param_paths(self) -> tp.List[tp.Tuple[str, ...]]:
        return []

    def num_params(self, params: Params) -> int:
        return sum(l.size for l in jax.tree.leaves(params))
