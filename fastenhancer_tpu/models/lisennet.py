"""LiSenNet baseline (streamable re-implementation).

Reference: models/lisennet/model.py — inputs are magnitude + phase features
(group delay, instantaneous-frequency deviation, :486-509), a 3-stage
split-band conv encoder (DSConv: separate low/high-band kernels with a
1-frame time cache, :178-207), N x DPR blocks (dual-path RNN: freq bi-GRU +
time uni-GRU with LayerNorm([F, C]) pre-norms, plus a ConvolutionalGLU with
a depthwise 3x3 time-causal conv and a 2-frame cache, :62-136), and a
sub-pixel upsampling mask decoder with LearnableSigmoid (:210-311).

Streaming deviation (documented): the reference's streaming ONNX graph
computes phase differences with the opposite sign of its own training graph
(ONNXModel.cal_gd = prev - cur vs Model.cal_gd = cur - prev). We keep the
TRAINING convention in both modes so streaming == offline holds and
checkpoint parity is against the training graph.
"""
from __future__ import annotations

import math
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


def custom_layer_norm(p: Params, x: Array, stat_axes: tp.Tuple[int, ...],
                      eps: float = 1e-5) -> Array:
    """Reference CustomLayerNorm (:13-36): normalize over stat_axes with
    broadcastable affine params."""
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=stat_axes, keepdims=True)
    var = jnp.var(xf, axis=stat_axes, keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    return (y * p["gamma"] + p["beta"]).astype(in_dtype)


def layer_norm_fc_affine(p: Params, x: Array, eps: float = 1e-5) -> Array:
    """nn.LayerNorm([F, C]): normalize + elementwise affine over (F, C)."""
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(-2, -1), keepdims=True)
    var = jnp.var(xf, axis=(-2, -1), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"] + p["bias"]).astype(in_dtype)


def prelu(p: Array, x: Array) -> Array:
    """Per-channel PReLU; p: [C] broadcast over the channel (last) axis."""
    return jnp.where(x >= 0, x, p * x)


def _conv2d_cl(p: Params, x: Array, stride=(1, 1), padding=((0, 0), (0, 0))):
    """x: [B, T, F, Cin], weight torch [Cout, Cin, kT, kF]."""
    w = jnp.transpose(p["weight"], (2, 3, 1, 0))
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"]
    return y


def _dwconv2d_cl(p: Params, x: Array, padding):
    """Depthwise conv: weight torch [C, 1, kT, kF]."""
    c = p["weight"].shape[0]
    w = jnp.transpose(p["weight"], (2, 3, 1, 0))  # [kT, kF, 1, C]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    if "bias" in p:
        y = y + p["bias"]
    return y


class Model:
    def __init__(
        self,
        num_channels: int = 16,
        n_blocks: int = 2,
        n_fft: int = 512,
        hop_size: int = 256,
        win_size: int = 512,
        window: tp.Optional[str] = "hann",
        input_compression: float = 0.3,
        normalized: bool = False,
        stft_method: str = "fft",
    ):
        self.c = num_channels
        self.n_blocks = n_blocks
        self.n_fft = n_fft
        self.hop_size = hop_size
        self.n_freqs = n_fft // 2 + 1
        self.input_compression = input_compression
        # stft_method="matmul": MXU windowed-DFT form, faster per frame
        # (same knob as the fastenhancer family; math-identical to fft)
        self.stft_cfg = STFTConfig(n_fft=n_fft, hop_size=hop_size,
                                   win_size=win_size, win_type=window,
                                   normalized=normalized,
                                   method=stft_method)
        self.dpr_freq = self.n_freqs // 8  # 32

    # -- init -------------------------------------------------------------------------

    def init(self, key: Array) -> tp.Dict[str, Params]:
        c = self.c
        keys = iter(jax.random.split(key, 64))
        P: Params = {}

        def conv2d(out_ch, in_ch, kt, kf, bias=True):
            k = next(keys)
            fan_in = in_ch * kt * kf
            bound = 1.0 / math.sqrt(fan_in)
            p = {"weight": jax.random.uniform(
                k, (out_ch, in_ch, kt, kf), jnp.float32, -bound, bound)}
            if bias:
                p["bias"] = jax.random.uniform(
                    next(keys), (out_ch,), jnp.float32, -bound, bound)
            return p

        def dsconv(in_ch, out_ch, n_freqs):
            return {
                "low_conv": conv2d(out_ch, in_ch, 2, 3),
                "high_conv": conv2d(out_ch, in_ch, 2, 5),
                # CustomLayerNorm((1, F//2), stat_dims=(1,3)): affine over freq
                "norm": {"gamma": jnp.ones((n_freqs // 2, 1)),
                         "beta": jnp.zeros((n_freqs // 2, 1))},
                "act": jnp.full((out_ch,), 0.25),  # PReLU init
            }

        P["encoder"] = {
            "conv_1": {"conv": conv2d(c // 4, 3, 1, 1),
                       "norm": {"gamma": jnp.ones((257, 1)),
                                "beta": jnp.zeros((257, 1))},
                       "act": jnp.full((c // 4,), 0.25)},
            "conv_2": dsconv(c // 4, c // 2, 257),
            "conv_3": dsconv(c // 2, c // 4 * 3, 128),
            "conv_4": dsconv(c // 4 * 3, c, 64),
        }

        P["blocks"] = []
        hdim = c // 2 * 3
        f = self.dpr_freq
        for _ in range(self.n_blocks):
            ks = jax.random.split(next(keys), 4)
            P["blocks"].append({
                "intra_norm": {"weight": jnp.ones((f, c)),
                               "bias": jnp.zeros((f, c))},
                "intra_rnn": fnn.init_bigru(ks[0], c, hdim // 2),
                "intra_fc": fnn.torch_linear_init(ks[1], c, hdim, True),
                "inter_norm": {"weight": jnp.ones((f, c)),
                               "bias": jnp.zeros((f, c))},
                "inter_rnn": fnn.init_gru(ks[2], c, hdim),
                "inter_fc": fnn.torch_linear_init(ks[3], c, hdim, True),
                "glu": {
                    # CustomLayerNorm((C, F), stat_dims=(1,3)): affine [F, C]
                    "norm": {"gamma": jnp.ones((f, c)),
                             "beta": jnp.zeros((f, c))},
                    "fc1": conv2d(4 * c, c, 1, 1),
                    "dwconv": conv2d(2 * c, 1, 3, 3),
                    "fc2": conv2d(c, 2 * c, 1, 1),
                },
            })

        P["decoder"] = {
            "up1": {"low_conv": conv2d(c // 4 * 3, 2 * c, 1, 3),
                    "high_conv": conv2d(c // 4 * 3 * 3, 2 * c, 1, 3)},
            "up2": {"low_conv": conv2d(c // 2, c // 4 * 3 * 2, 1, 3),
                    "high_conv": conv2d(c // 2 * 3, c // 4 * 3 * 2, 1, 3)},
            "up3": {"low_conv": conv2d(c // 4, c, 1, 3),
                    "high_conv": conv2d(c // 4 * 3, c, 1, 3)},
            "mask_conv": {"conv1": conv2d(2, c // 4, 2, 2),
                          "norm": {"gamma": jnp.ones((257, 1)),
                                   "beta": jnp.zeros((257, 1))},
                          "act": jnp.full((2,), 0.25),
                          "conv2": conv2d(2, 2, 1, 1)},
            "lsigmoid": {"slope": jnp.ones((self.n_freqs, 1, 1))},
        }
        return {"params": P, "stats": {}}

    # -- pieces -----------------------------------------------------------------------

    def _cln_freq(self, p: Params, x: Array) -> Array:
        """CustomLayerNorm((1|C, F), stat_dims=(1,3)) on torch [B,C,T,F]:
        normalize over (C, F); affine per F. x here: [B, T, F, C]."""
        in_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(2, 3), keepdims=True)
        var = jnp.var(xf, axis=(2, 3), keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + 1e-5)
        gamma = p["gamma"]  # [F, 1] broadcast over channels
        beta = p["beta"]
        return (y * gamma + beta).astype(in_dtype)

    def _dsconv(self, p: Params, x: Array, cache: tp.Optional[Array],
                n_freqs: int) -> tp.Tuple[Array, Array]:
        """x: [B, T, F, Cin] -> ([B, T, F//2, Cout], cache [B, 1, F, Cin])."""
        b, t, f, cin = x.shape
        if cache is None:
            cache = jnp.zeros((b, 1, f, cin), x.dtype)
        x = jnp.concatenate([cache, x], axis=1)
        cache_out = x[:, -1:]
        low_f = n_freqs // 4
        x_low = _conv2d_cl(p["low_conv"], x[:, :, :low_f],
                           padding=((0, 0), (1, 1)))
        x_high = _conv2d_cl(p["high_conv"], x[:, :, low_f:], stride=(1, 3),
                            padding=((0, 0), (1, 1)))
        y = jnp.concatenate([x_low, x_high], axis=2)
        y = self._cln_freq(p["norm"], y)
        return prelu(p["act"], y), cache_out

    def _usconv(self, p: Params, x: Array, n_freqs: int) -> Array:
        """x: [B, T, F, Cin] -> [B, T, 2F, Cout] (low conv + sub-pixel high)."""
        low_f = n_freqs // 2
        x_low = _conv2d_cl(p["low_conv"], x[:, :, :low_f],
                           padding=((0, 0), (1, 1)))
        # SPConvTranspose2d r=3: conv to 3*Cout then interleave freq
        y = _conv2d_cl(p["high_conv"], x[:, :, low_f:],
                       padding=((0, 0), (1, 1)))
        b, t, f, c3 = y.shape
        cout = c3 // 3
        # torch: view(B, r, C, T, F) -> permute -> [B, C, T, F*r]
        y = y.reshape(b, t, f, 3, cout)
        y = y.transpose(0, 1, 2, 3, 4).reshape(b, t, f * 3, cout)
        return jnp.concatenate([x_low, y], axis=2)

    def _glu(self, p: Params, x: Array, cache: tp.Optional[Array]
             ) -> tp.Tuple[Array, Array]:
        """ConvolutionalGLU. x: [B, T, F, C]."""
        b, t, f, c = x.shape
        res = x
        y = self._cln_freq(p["norm"], x)
        y = _conv2d_cl(p["fc1"], y)
        a, v = jnp.split(y, 2, axis=-1)  # [B, T, F, 2C] each
        if cache is None:
            cache = jnp.zeros((b, 2, f, a.shape[-1]), x.dtype)
        a = jnp.concatenate([cache, a], axis=1)
        cache_out = a[:, -2:]
        a = _dwconv2d_cl(p["dwconv"], a, padding=((0, 0), (1, 1)))
        mish = lambda z: z * jnp.tanh(jax.nn.softplus(z))  # noqa: E731
        y = mish(a) * v
        y = _conv2d_cl(p["fc2"], y)
        return y + res, cache_out

    def _dpr(self, p: Params, x: Array, cache_rnn, cache_conv):
        """x: [B, T, F, C] (torch works in [B, C, T, F])."""
        b, t, f, c = x.shape
        x_res = x
        y = layer_norm_fc_affine(p["intra_norm"], x)
        y = y.reshape(b * t, f, c).swapaxes(0, 1)  # [F, B*T, C]
        y = fnn.bigru(p["intra_rnn"], y)
        y = y.swapaxes(0, 1)
        y = fnn.linear(p["intra_fc"], y).reshape(b, t, f, c)
        x = y + x_res

        x_res = x
        y = layer_norm_fc_affine(p["inter_norm"], x)
        y = y.transpose(0, 2, 1, 3).reshape(b * f, t, c).swapaxes(0, 1)
        y, h_out = fnn.gru(p["inter_rnn"], y, cache_rnn)  # [T, B*F, hdim]
        y = fnn.linear(p["inter_fc"], y)                  # [T, B*F, C]
        y = y.swapaxes(0, 1).reshape(b, f, t, c).transpose(0, 2, 1, 3)
        x = y + x_res

        x, cache_conv = self._glu(p["glu"], x, cache_conv)
        return x, h_out, cache_conv

    # -- phase features -----------------------------------------------------------------

    @staticmethod
    def _wrap(x: Array) -> Array:
        return jnp.arctan2(jnp.sin(x), jnp.cos(x))

    def _features(self, spec: Array, prev_pha: tp.Optional[Array]
                  ) -> tp.Tuple[Array, Array]:
        """spec (compressed) [B, F, T, 2] -> (features [B, T, F, 3],
        last-frame phase [B, 1, F]). Training conventions (Model.cal_*)."""
        x = spec.transpose(0, 2, 1, 3)  # [B, T, F, 2]
        mag = jnp.linalg.norm(x, axis=-1)
        pha = jnp.arctan2(x[..., 1], x[..., 0])  # [B, T, F]
        b, t, f = pha.shape
        gd = self._wrap(jnp.diff(pha, axis=2,
                                 prepend=jnp.zeros((b, t, 1), pha.dtype)))
        if prev_pha is None:
            prev_pha = jnp.zeros((b, 1, f), pha.dtype)
        x_if = pha - jnp.concatenate([prev_pha, pha[:, :-1]], axis=1)
        ifd = self._wrap(
            x_if - 2.0 * jnp.pi * (self.hop_size / self.n_fft)
            * jnp.arange(f, dtype=pha.dtype)[None, None, :])
        feats = jnp.stack([mag, gd / jnp.pi, ifd / jnp.pi], axis=-1)
        return feats, pha[:, -1:]

    # -- full graph ------------------------------------------------------------------------

    def model_forward(self, params: Params, stats: Params, spec: Array,
                      h0=None, train: bool = False):
        """Compressed spec [B, F, T, 2] -> (spec_hat, carry, stats)."""
        del train  # no batch statistics anywhere
        P = params
        prev_pha = None if h0 is None else h0["pha"]
        feats, last_pha = self._features(spec, prev_pha)  # [B, T, F, 3]
        b, t, f0, _ = feats.shape

        enc = P["encoder"]
        x1 = _conv2d_cl(enc["conv_1"]["conv"], feats)
        x1 = self._cln_freq(enc["conv_1"]["norm"], x1)
        x1 = prelu(enc["conv_1"]["act"], x1)
        caches = {"enc": [None] * 3, "dpr_rnn": [None] * self.n_blocks,
                  "dpr_conv": [None] * self.n_blocks, "dec": None} \
            if h0 is None else h0
        x2, c2 = self._dsconv(enc["conv_2"], x1, caches["enc"][0], 257)
        x3, c3 = self._dsconv(enc["conv_3"], x2, caches["enc"][1], 128)
        x4, c4 = self._dsconv(enc["conv_4"], x3, caches["enc"][2], 64)

        x = x4
        rnn_out, conv_out = [], []
        for i, bp in enumerate(P["blocks"]):
            x, h, cc = self._dpr(bp, x, caches["dpr_rnn"][i],
                                 caches["dpr_conv"][i])
            rnn_out.append(h)
            conv_out.append(cc)

        dec = P["decoder"]
        y = self._usconv(dec["up1"], jnp.concatenate([x, x4], axis=-1), 32)
        y = self._usconv(dec["up2"], jnp.concatenate([y, x3], axis=-1), 64)
        y = self._usconv(dec["up3"], jnp.concatenate([y, x2], axis=-1), 128)
        dcache = caches["dec"]
        if dcache is None:
            dcache = jnp.zeros((b, 1) + y.shape[2:], y.dtype)
        y = jnp.concatenate([dcache, y], axis=1)
        dcache_out = y[:, -1:]
        mc = dec["mask_conv"]
        y = _conv2d_cl(mc["conv1"], y, padding=((0, 0), (1, 1)))  # [B,T,257,2]
        y = self._cln_freq(mc["norm"], y)
        y = prelu(mc["act"], y)
        y = _conv2d_cl(mc["conv2"], y)
        # LearnableSigmoid over freq (slope [F, 1, 1] on [B, F, T, 2])
        y = y.transpose(0, 2, 1, 3)  # [B, F, T, 2]
        mask = jax.nn.sigmoid(dec["lsigmoid"]["slope"] * y)

        re = spec[..., 0] * mask[..., 0] - spec[..., 1] * mask[..., 1]
        im = spec[..., 0] * mask[..., 1] + spec[..., 1] * mask[..., 0]
        spec_hat = jnp.stack([re, im], axis=3)
        carry = {"pha": last_pha, "enc": [c2, c3, c4], "dpr_rnn": rnn_out,
                 "dpr_conv": conv_out, "dec": dcache_out}
        return spec_hat, carry, stats

    # -- training graph -----------------------------------------------------------------------

    def stft(self, wav: Array) -> Array:
        return compressed_stft(wav, self.stft_cfg, self.input_compression)

    def forward(self, variables: Params, wav: Array, train: bool = False,
                row_mask: tp.Optional[Array] = None):
        # row_mask accepted for API uniformity; LiSenNet has no cross-row
        # (batch-stat) ops — all norms are per-item LayerNorms — so padded
        # rows cannot leak into real rows.
        del row_mask
        params, stats = variables["params"], variables["stats"]
        spec = compressed_stft(wav, self.stft_cfg, self.input_compression)
        spec_hat, _, _ = self.model_forward(params, stats, spec, train=train)
        wav_hat = compressed_istft(spec_hat, self.stft_cfg,
                                   self.input_compression,
                                   length=wav.shape[-1])
        return wav_hat, spec_hat, stats

    # -- streaming ---------------------------------------------------------------------------

    def init_streaming_carry(self, batch: int, dtype=jnp.float32) -> Params:
        c = self.c
        hdim = c // 2 * 3
        f = self.dpr_freq
        return {
            "stft": init_stft_carry(self.stft_cfg, batch, dtype),
            "istft": init_istft_carry(self.stft_cfg, batch, dtype),
            "h": {
                "pha": jnp.zeros((batch, 1, self.n_freqs), dtype),
                "enc": [jnp.zeros((batch, 1, 257, c // 4), dtype),
                        jnp.zeros((batch, 1, 128, c // 2), dtype),
                        jnp.zeros((batch, 1, 64, c // 4 * 3), dtype)],
                "dpr_rnn": [jnp.zeros((batch * f, hdim), dtype)
                            for _ in range(self.n_blocks)],
                "dpr_conv": [jnp.zeros((batch, 2, f, 2 * c), dtype)
                             for _ in range(self.n_blocks)],
                "dec": jnp.zeros((batch, 1, 256, c // 4), dtype),
            },
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

    def fold(self, variables: Params) -> Params:
        """No reparameterizations to remove (reference: :476-477)."""
        return variables

    # -- misc -----------------------------------------------------------------------------------

    def torch_name(self, path: tp.Tuple[str, ...]) -> tp.Optional[str]:
        head = path[0]
        if head == "encoder":
            mod = path[1]
            if mod == "conv_1":
                sub, leaf = path[2], path[3] if len(path) > 3 else None
                if sub == "conv":
                    return f"encoder.conv_1.0.{leaf}"
                if sub == "norm":
                    return f"encoder.conv_1.1.{leaf}"
                return "encoder.conv_1.2.weight"  # PReLU
            sub = path[2]
            if sub == "act":
                return f"encoder.{mod}.act.weight"
            if sub == "norm":
                return f"encoder.{mod}.norm.{path[3]}"
            return f"encoder.{mod}.{sub}.{path[3]}"
        if head == "blocks":
            i, mod = path[1], path[2]
            prefix = f"blocks.{i}"
            if mod in ("intra_norm", "inter_norm"):
                return f"{prefix}.dp_rnn_attn.{mod}.{path[3]}"
            if mod in ("intra_rnn", "inter_rnn"):
                kind = mod.split("_")[0]
                if mod == "intra_rnn":
                    d, leaf = path[3], path[4]
                    sfx = "_l0" if d == "fwd" else "_l0_reverse"
                    return (f"{prefix}.dp_rnn_attn.{kind}_rnn_attn.rnn."
                            f"{leaf}{sfx}")
                return (f"{prefix}.dp_rnn_attn.{kind}_rnn_attn.rnn."
                        f"{path[3]}_l0")
            if mod in ("intra_fc", "inter_fc"):
                kind = mod.split("_")[0]
                return f"{prefix}.dp_rnn_attn.{kind}_rnn_attn.dense.{path[3]}"
            if mod == "glu":
                sub = path[3]
                if sub == "norm":
                    return f"{prefix}.conv_glu.norm.{path[4]}"
                return f"{prefix}.conv_glu.{sub}.{path[4]}"
        if head == "decoder":
            mod = path[1]
            if mod in ("up1", "up2", "up3"):
                sub, leaf = path[2], path[3]
                if sub == "high_conv":
                    return f"decoder.{mod}.high_conv.conv.{leaf}"
                return f"decoder.{mod}.low_conv.{leaf}"
            if mod == "mask_conv":
                sub = path[2]
                idx = {"conv1": 0, "norm": 1, "act": 2, "conv2": 3}[sub]
                leaf = path[3] if len(path) > 3 else "weight"
                return f"decoder.mask_conv.{idx}.{leaf}"
            if mod == "lsigmoid":
                return "decoder.lsigmoid.slope"
        raise KeyError(f"unmapped lisennet param path: {path}")

    def fixed_param_paths(self) -> tp.List[tp.Tuple[str, ...]]:
        return []

    def num_params(self, params: Params) -> int:
        return sum(l.size for l in jax.tree.leaves(params))
