"""FastEnhancer (RNNFormer) — TPU-native rebuild of the paper model.

Reference behavior: models/fastenhancer/default/model.py (PyTorch). This is a
from-scratch functional JAX design, NOT a translation:

* One parameter pytree serves two apply modes — `forward` (whole-utterance
  training graph, time-batched MXU matmuls) and `stream` (a single
  `jax.lax.scan` whose carry pytree {stft, istft, K GRU hiddens} replaces the
  reference's ONNX cache-list plumbing, reference: models/.../model.py:614-710).
* BatchNorm uses global-batch statistics under pjit (== reference SyncBatchNorm,
  models/.../model.py:121-126,181-184) with stats threaded functionally.
* The deploy-time reparameterization removal (weight-norm strip, BN→conv merge,
  pre-norm fold; reference: models/.../model.py:215-258,532-608) is a pure
  param-tree transform `fold()`; folded and unfolded trees run through the SAME
  apply code (a conv applies BN only if its subtree carries one).

Architecture (reference: models/.../model.py:383-710): complex spectrogram
[B,F,T,2] -> strided "reshape-trick" conv encoder over frequency -> learnable
(or fixed mel/linear) frequency resampling -> K x RNNFormer blocks
(time-GRU + freq-MHSA with post-BN residuals) -> skip-concat conv decoder ->
scaled transposed-conv upsample -> complex ratio mask.
"""
from __future__ import annotations

import dataclasses
import functools
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn as fnn
from ...functional import (
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


def _wn_suffix(torch_weight_name: str, sub: tp.Optional[str]) -> str:
    """weight-norm {g,v} leaves -> torch parametrization key names."""
    if sub is None:
        return torch_weight_name
    which = "original0" if sub == "g" else "original1"
    return f"parametrizations.{torch_weight_name}.{which}"


def _torch_name_default(path: tp.Tuple[str, ...], prepost: str = "rf",
                        block: str = "rf_block") -> tp.Optional[str]:
    """Param-tree path -> reference torch parameter name (fastenhancer family).

    Reference module layout: enc_pre.{0 conv,1 bn}, encoder.{i}.{0,1},
    rf_pre.{0 lin,1 conv,2 bn}, rf_block.{i}.{rnn,rnn_fc,rnn_post_norm,attn.qkv,
    attn_fc,attn_post_norm,pe}, decoder.{i}.{0,1,3,4}, dec_post.{0,1,3}.
    Variants rename the prefixes (dprnn_pre/dprnn_block, dpt_pre/dpt_block).
    """
    head, rest = path[0], path[1:]
    if head in ("enc_pre", "dec_post") or head == "encoder":
        if head == "encoder":
            prefix = f"encoder.{rest[0]}"
            rest = rest[1:]
        else:
            prefix = head
        mod, leaf = rest[0], rest[1]
        if mod == "conv":
            return f"{prefix}.0.{leaf}"
        if mod == "bn":
            return f"{prefix}.1.{leaf}"
        if mod == "convt":  # dec_post only
            return f"{prefix}.3.{leaf}"
    if head in ("rf_pre", "rf_post"):
        mod, leaf = rest[0], rest[1]
        idx = {"lin": 0, "conv": 1, "bn": 2}[mod]
        side = "pre" if head == "rf_pre" else "post"
        return f"{prepost}_{side}.{idx}.{leaf}"
    if head == "rf_blocks":
        i, mod = rest[0], rest[1]
        prefix = f"{block}.{i}"
        if mod == "rnn":
            leaf = rest[2]
            sub = rest[3] if len(rest) > 3 else None
            if leaf.startswith("weight"):
                return f"{prefix}.rnn.{_wn_suffix(leaf + '_l0', sub)}"
            return f"{prefix}.rnn.{leaf}_l0"
        if mod == "attn":
            leaf = rest[3]  # ("attn","qkv",leaf[,sub])
            sub = rest[4] if len(rest) > 4 else None
            if leaf == "weight":
                return f"{prefix}.attn.qkv.{_wn_suffix('weight', sub)}"
            return f"{prefix}.attn.qkv.{leaf}"
        if mod == "pe":
            return f"{prefix}.pe"
        return f"{prefix}.{mod}.{rest[2]}"
    if head == "decoder":
        i, mod, leaf = rest[0], rest[1], rest[2]
        idx = {"conv1": 0, "bn1": 1, "conv2": 3, "bn2": 4}[mod]
        return f"decoder.{i}.{idx}.{leaf}"
    raise KeyError(f"unmapped param path: {path}")


# ---------------------------------------------------------------------------
# Frequency-resampling filterbank init (reference: models/.../model.py:308-380)
# ---------------------------------------------------------------------------

def rf_pre_post_weights(
    n_freq: int, n_filter: int, init: str, sr: int = 16_000
) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Triangular filterbank weights [n_filter, n_freq] and its transpose-ish
    inverse [n_freq, n_filter], row-normalized. init in {linear, mel}[_fixed]."""
    if init.startswith("linear"):
        delta = np.full((n_filter - 1, 1), (n_freq - 1) / (n_filter - 1))
        f_filter = np.linspace(0, n_freq - 1, n_filter)
    elif init.startswith("mel"):
        def freq_idx_to_mel(f: float) -> float:
            hz = f / n_freq * sr / 2
            return 2595.0 * math.log10(1 + hz / 700)

        max_hz = sr / 2 * (n_freq - 1) / n_freq
        delta_hz = max_hz / (n_freq - 1)
        max_mel = freq_idx_to_mel(n_freq - 1)

        def mel_idx_to_freq_idx(n: float) -> float:
            mel = n / (n_filter - 1) * max_mel
            return 700.0 * (10 ** (mel / 2595) - 1) / delta_hz

        # low filters too narrow for one bin -> linear there, mel above
        f_filter: tp.List[float] = []
        f_cur = mel_idx_to_freq_idx(0)
        n_start = 0
        for n_start in range(0, n_filter - 1):
            f_next = mel_idx_to_freq_idx(n_start + 1)
            if f_next - f_cur >= 1 and n_start <= f_cur:
                break
            f_filter.append(float(n_start))
            f_cur = f_next
        f_filter.extend(mel_idx_to_freq_idx(n) for n in range(n_start, n_filter))
        f_filter = np.asarray(f_filter, dtype=np.float64)
        delta = (f_filter[1:] - f_filter[:-1])[:, None]
    else:
        raise ValueError(f"unsupported rf init: {init}")

    f_freqs = np.arange(n_freq, dtype=np.float64)
    down = (f_filter[1:, None] - f_freqs[None, :]) / delta
    up = (f_freqs[None, :] - f_filter[:-1, None]) / delta
    down = np.concatenate([down, np.ones((1, n_freq))], axis=0)
    up = np.concatenate([np.ones((1, n_freq)), up], axis=0)
    pre = np.maximum(0.0, np.minimum(down, up))
    pre = pre / pre.sum(axis=1, keepdims=True)
    post = pre.T.copy()
    post = post / post.sum(axis=1, keepdims=True)
    return pre.astype(np.float32), post.astype(np.float32)


def fold_fc_bn(fc: Params, bn_p: Params, bn_s: Params, eps: float) -> Params:
    """post-norm BN folded into the preceding linear."""
    std = jnp.sqrt(bn_s["var"] + eps)
    g = bn_p["weight"] / std
    return {"weight": fc["weight"] * g[:, None],
            "bias": bn_p["bias"] - bn_s["mean"] * g}


def fold_prenorm_into_rnn(rnn: Params, bn_s: Params, eps: float) -> Params:
    """affine-less pre-norm folded into GRU input weights/bias."""
    std = jnp.sqrt(bn_s["var"] + eps)
    beta = -bn_s["mean"] / std
    rnn = dict(rnn)
    rnn["bias_ih"] = rnn["bias_ih"] + rnn["weight_ih"] @ beta
    rnn["weight_ih"] = rnn["weight_ih"] / std
    return rnn


def positional_embedding(channels: int, freq: int) -> np.ndarray:
    """Log-spaced sin/cos freq embedding [F, C] (reference: model.py:98-110)."""
    f = np.arange(1, freq + 1, dtype=np.float64) * (math.pi / freq)
    c = np.exp(np.linspace(math.log(1.0), math.log(freq - 1), channels // 2))
    grid = f[:, None] * c[None, :]
    return np.concatenate([np.sin(grid), np.cos(grid)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RNNFormerConfig:
    num_blocks: int = 3
    channels: int = 32
    freq: int = 32
    num_heads: int = 4
    eps: float = 1e-8
    positional_embedding: tp.Optional[str] = "train"  # None | "fixed" | "train"
    attn_bias: bool = False
    post_act: bool = False
    pre_norm: bool = False
    p_dropout: float = 0.0


class Model:
    """FastEnhancer default. Accepts the reference's `model_kwargs` unchanged
    (configs/fastenhancer/*.yaml)."""

    def __init__(
        self,
        channels: int = 64,
        kernel_size: tp.Sequence[int] = (8, 3, 3),
        stride: int = 4,
        rnnformer_kwargs: tp.Optional[tp.Dict[str, tp.Any]] = None,
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
        normalize_final_conv: bool = False,
        pre_post_init: tp.Optional[str] = None,
        resnet: bool = False,
        sampling_rate: int = 16_000,
        stft_method: str = "fft",
    ):
        del activation_kwargs  # torch `inplace` flag — meaningless here
        self.channels = channels
        self.kernel_size = list(kernel_size)
        self.stride = stride
        self.rf = RNNFormerConfig(**(rnnformer_kwargs or {}))
        self.activation = activation
        self.act = fnn.get_activation(activation)
        self.n_fft = n_fft
        self.hop_size = hop_size
        # "matmul" runs the windowed DFT as one MXU matmul — measured ~25%
        # faster than the fft form for the per-frame streaming step at
        # B=256 on TPU v5e (math-identical; conv_stft pins it)
        self.stft_cfg = STFTConfig(
            n_fft=n_fft, hop_size=hop_size, win_size=win_size,
            win_type=window, normalized=stft_normalized, method=stft_method,
        )
        self.mask_name = mask
        self.mask_act = {
            None: lambda x: x,
            "sigmoid": jax.nn.sigmoid,
            "tanh": jnp.tanh,
        }[mask]
        self.input_compression = input_compression
        self.weight_norm = weight_norm
        self.normalize_final_conv = normalize_final_conv
        self.pre_post_init = pre_post_init
        self.resnet = resnet
        self.sampling_rate = sampling_rate
        self.freq = n_fft // 2 // stride  # encoder-out freq bins
        # variant-shared block geometry (subclasses set their own)
        self.num_blocks = self.rf.num_blocks
        self.block_freq = self.rf.freq
        self.block_channels = self.rf.channels
        # variants expose final_scale in {True, False, "exp"} and a scale
        # initializer (reference: models/.../ln/model.py:84-116); the paper
        # model is the plain scale=1 case.
        self.final_scale: tp.Union[bool, str] = True
        self.final_scale_init: str = "one"
        self.tname_prepost = "rf"
        self.tname_block = "rf_block"
        # gradient rematerialisation (train.remat): per-unit/per-block
        # jax.checkpoint so activation memory is O(1 block) instead of
        # O(depth) — set by the training wrapper, ignored outside training
        self.remat = False
        # row inclusion mask [B] for train-mode BatchNorm statistics, set
        # for the duration of forward(..., row_mask=...) (trace-time only;
        # see forward). None = all rows real.
        self._row_mask: tp.Optional[Array] = None
        assert kernel_size[0] % stride == 0
        assert (kernel_size[0] - stride) % 2 == 0

    # -- init ---------------------------------------------------------------

    def init(self, key: Array) -> tp.Dict[str, Params]:
        cfg, rf = self, self.rf
        c = cfg.channels
        keys = iter(jax.random.split(key, 64))

        params: Params = {}
        stats: Params = {}

        # NOTE: weight_norm in the reference applies ONLY to the RNNFormer GRU
        # and qkv weights (models/.../model.py:209-213); convolutions are plain.
        conv_bn = self._conv_block_init

        # Encoder PreNet: strided conv via reshape trick (in=2*stride, k=k0/stride)
        k0 = cfg.kernel_size[0]
        params["enc_pre"], stats["enc_pre"] = conv_bn(
            next(keys), c, 2 * cfg.stride, k0 // cfg.stride, site="enc_pre")

        params["encoder"], stats["encoder"] = [], []
        for k in cfg.kernel_size[1:]:
            p, s = conv_bn(next(keys), c, c, k, site="encoder")
            params["encoder"].append(p)
            stats["encoder"].append(s)

        # rf_pre / rf_post frequency resampling
        if cfg.pre_post_init is None:
            pre_w = fnn.torch_linear_init(next(keys), rf.freq, cfg.freq, False)["weight"]
            post_w = fnn.torch_linear_init(next(keys), cfg.freq, rf.freq, False)["weight"]
        else:
            pre_w, post_w = map(jnp.asarray, rf_pre_post_weights(
                cfg.freq, rf.freq, cfg.pre_post_init, cfg.sampling_rate))
        conv_p, conv_s = conv_bn(next(keys), self.block_channels, c, 1,
                                 site="rf_pre")
        params["rf_pre"] = {"lin": {"weight": pre_w}, **conv_p}
        stats["rf_pre"] = conv_s
        conv_p, conv_s = conv_bn(next(keys), c, self.block_channels, 1,
                                 site="rf_post")
        params["rf_post"] = {"lin": {"weight": post_w}, **conv_p}
        stats["rf_post"] = conv_s

        # RNNFormer (or variant) blocks
        params["rf_blocks"], stats["rf_blocks"] = [], []
        for i in range(self.num_blocks):
            bp, bs = self._block_init(next(keys), i)
            params["rf_blocks"].append(bp)
            stats["rf_blocks"].append(bs)

        # Decoder
        params["decoder"], stats["decoder"] = [], []
        for k in cfg.kernel_size[:0:-1]:
            p1, s1 = conv_bn(next(keys), c, 2 * c, 1, site="decoder1")
            p2, s2 = conv_bn(next(keys), c, c, k, site="decoder2")
            unit = {"conv1": p1["conv"], "conv2": p2["conv"]}
            for tag, pp in (("1", p1), ("2", p2)):
                if "bn" in pp:
                    unit[f"bn{tag}"] = pp["bn"]
                if "gn" in pp:
                    unit[f"gn{tag}"] = pp["gn"]
            params["decoder"].append(unit)
            st = {}
            if "bn" in s1:
                st = {"bn1": s1["bn"], "bn2": s2["bn"]}
            stats["decoder"].append(st)

        # Decoder PostNet: 1x1 conv + BN + scaled transposed conv (C -> 2)
        p1, s1 = conv_bn(next(keys), c, 2 * c, 1, site="dec_post")
        convt = fnn.torch_convtranspose1d_init(next(keys), c, 2, k0, bias=True)
        if self.final_scale is not False:
            scale = jnp.ones(1)
            if self.normalize_final_conv:
                fsi = self.final_scale_init
                if fsi == "1/sqrt(fan_in)":
                    scale = scale / math.sqrt(c * k0 // cfg.stride)
                elif fsi == "||weight||":
                    scale = jnp.sqrt(jnp.sum(jnp.square(convt["weight"])))[None]
                elif fsi == "zero":
                    scale = jnp.zeros(1)
                elif fsi != "one":
                    mean, std = map(float, fsi.split("_"))
                    scale = jnp.sqrt(
                        jnp.sum(jnp.square(convt["weight"])))[None] * std
                    convt["bias"] = jnp.full_like(convt["bias"], mean)
            if self.final_scale == "exp":
                scale = jnp.log(jnp.maximum(scale, 1e-5))
            convt["scale"] = scale
        params["dec_post"] = {**p1, "convt": convt}
        stats["dec_post"] = s1
        return {"params": params, "stats": stats}

    def _conv_block_init(self, key: Array, out_ch: int, in_ch: int, k: int,
                         site: str = "") -> tp.Tuple[Params, Params]:
        """conv + norm unit; the ln variant overrides the norm kind and
        per-site conv bias."""
        del site
        p = fnn.torch_conv1d_init(key, out_ch, in_ch, k, bias=False)
        bn_p, bn_s = fnn.init_batch_norm(out_ch)
        return {"conv": p, "bn": bn_p}, {"bn": bn_s}

    def _block_init(self, key: Array, i: int) -> tp.Tuple[Params, Params]:
        """One RNNFormer block: time-GRU + freq-MHSA with post-BN residuals
        (reference: models/.../default/model.py:155-264)."""
        cfg, rf = self, self.rf
        bk = jax.random.split(key, 4)
        rnn = fnn.init_gru(bk[0], rf.channels, rf.channels)
        attn = fnn.init_attention(bk[1], rf.channels, rf.attn_bias)
        if cfg.weight_norm:
            rnn["weight_ih"] = fnn.to_wn(rnn["weight_ih"])
            rnn["weight_hh"] = fnn.to_wn(rnn["weight_hh"])
            attn["qkv"]["weight"] = fnn.to_wn(attn["qkv"]["weight"])
        bn_rnn_p, bn_rnn_s = fnn.init_batch_norm(rf.channels)
        bn_attn_p, bn_attn_s = fnn.init_batch_norm(rf.channels)
        bp: Params = {
            "rnn": rnn,
            "rnn_fc": fnn.torch_linear_init(bk[2], rf.channels, rf.channels, False),
            "rnn_post_norm": bn_rnn_p,
            "attn": attn,
            "attn_fc": fnn.torch_linear_init(bk[3], rf.channels, rf.channels, False),
            "attn_post_norm": bn_attn_p,
        }
        bs: Params = {"rnn_post_norm": bn_rnn_s, "attn_post_norm": bn_attn_s}
        if rf.pre_norm:
            _, bs["rnn_pre_norm"] = fnn.init_batch_norm(rf.channels, affine=False)
            _, bs["attn_pre_norm"] = fnn.init_batch_norm(rf.channels, affine=False)
        if i == 0 and rf.positional_embedding is not None:
            pe = jnp.asarray(positional_embedding(rf.channels, rf.freq))
            bp["pe"] = {"weight": pe}
        return bp, bs

    # -- building blocks ------------------------------------------------------

    def _conv_weight(self, p: Params) -> Array:
        return fnn.maybe_wn_weight(p, "weight")

    # -- row-mask -> BN-weight views (zero-padded-row masking) ----------------

    def _bn_w_bt(self, b: int, t: int) -> tp.Optional[Array]:
        """[B*T, 1, 1] weight for [B*T, F, C] layouts (b-major fold)."""
        m = self._row_mask
        if m is None:
            return None
        return jnp.repeat(m.astype(jnp.float32), t)[:, None, None]

    def _bn_w_tb(self) -> tp.Optional[Array]:
        """[1, B, 1, 1] weight for [T, B, F, C] layouts."""
        m = self._row_mask
        if m is None:
            return None
        return m.astype(jnp.float32)[None, :, None, None]

    def _bn_w_b(self, ndim: int) -> tp.Optional[Array]:
        """[B, 1, ...] weight for batch-leading layouts."""
        m = self._row_mask
        if m is None:
            return None
        return m.astype(jnp.float32).reshape(m.shape[0], *([1] * (ndim - 1)))

    def _conv_bn_act(
        self, p: Params, s: tp.Optional[Params], x: Array, *,
        stride: int = 1, padding: int = 0, train: bool, act: bool = True,
        eps: float = 1e-5, bw: tp.Optional[Array] = None,
    ) -> tp.Tuple[Array, tp.Optional[Params]]:
        """conv (+BN if present) (+activation). x: [N, F, Cin] channels-last.
        bw: optional per-N BN-stat inclusion weight ([N,1,1]-broadcastable).

        With self.remat set (train.remat), the unit is wrapped in
        jax.checkpoint so backward recomputes the conv/BN/act intermediates
        instead of keeping [B*T, F, C] activations resident — what lets the
        L recipe (batch 64 x 2 s, reference configs/fastenhancer/l.yaml)
        train on a single 16 GB chip.
        """
        if train and self.remat:
            fn = jax.checkpoint(functools.partial(
                self._conv_bn_act_impl, stride=stride, padding=padding,
                train=True, act=act, eps=eps))
            return fn(p, s, x, bw)
        return self._conv_bn_act_impl(p, s, x, bw, stride=stride,
                                      padding=padding, train=train, act=act,
                                      eps=eps)

    def _conv_bn_act_impl(
        self, p: Params, s: tp.Optional[Params], x: Array,
        bw: tp.Optional[Array] = None, *,
        stride: int = 1, padding: int = 0, train: bool, act: bool = True,
        eps: float = 1e-5,
    ) -> tp.Tuple[Array, tp.Optional[Params]]:
        conv = dict(p["conv"])
        conv["weight"] = self._conv_weight(p["conv"])
        y = fnn.conv1d_cl(conv, x, stride=stride, padding=padding)
        new_s = None
        if "bn" in p and p["bn"] is not None:
            y, new_bn = fnn.batch_norm(p["bn"], s["bn"], y, train=train,
                                       eps=eps, weight=bw)
            new_s = {"bn": new_bn}
        elif "gn" in p and p["gn"] is not None:
            y = fnn.layer_norm_fc(p["gn"], y, eps=eps)
        if act:
            y = self.act(y)
        return y, new_s

    def _scaled_convt(self, p: Params, x: Array) -> Array:
        """ScaledConvTranspose1d (reference: model.py:62-95)."""
        w = p["weight"]
        if "scale" in p:  # unfolded
            scale = p["scale"]
            if self.final_scale == "exp":
                scale = jnp.exp(scale)
            if self.normalize_final_conv:
                norm = jnp.sqrt(jnp.sum(jnp.square(w)))
                w = w / jnp.maximum(norm, 1e-12) * scale
            else:
                w = w * scale
        pad = (self.kernel_size[0] - self.stride) // 2
        return fnn.conv_transpose1d_cl(
            {"weight": w, "bias": p["bias"]}, x,
            stride=self.stride, padding=pad)

    def _strided_reshape(self, x: Array) -> Array:
        """[N, F, C] -> pad -> [N, F/s, C*s] (stride-major channel order,
        matching the reference StridedConv1d reshape, model.py:51-59)."""
        s = self.stride
        pad = (self.kernel_size[0] - s) // 2
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        n, f, c = x.shape
        return x.reshape(n, f // s, s * c)

    # -- core network ----------------------------------------------------------

    def model_forward(
        self,
        params: Params,
        stats: Params,
        spec: Array,
        h0: tp.Optional[tp.List[Array]] = None,
        train: bool = False,
    ) -> tp.Tuple[Array, tp.List[Array], Params]:
        """Compressed spec [B, F, T, 2] -> (mask [B, F, T, 2], h_T list, new_stats).

        Reference: models/.../model.py:620-675 (model_forward).
        """
        x, x_res, skips, b, t, new_stats = self._encode(params, stats, spec,
                                                        train=train)

        h_out: tp.List[Array] = []
        for i, (bp, bs) in enumerate(zip(params["rf_blocks"], stats["rf_blocks"])):
            h_i = None if h0 is None else h0[i]
            x, h_t, s = self._apply_block(bp, bs, x, h_i, train)
            h_out.append(h_t)
            if s is not None:
                new_stats["rf_blocks"][i] = s

        mask = self._decode(params, stats, new_stats, x, x_res, skips, b, t,
                            spec.shape[1], train=train)
        return mask, h_out, new_stats

    def _encode(
        self, params: Params, stats: Params, spec: Array, train: bool = False
    ) -> tp.Tuple[Array, Array, tp.List[Array], int, int, Params]:
        """Everything before the block stack: spec [B, F, T, 2] ->
        (x [T, B, F', C'], rf_pre residual, skips, b, t, new_stats)."""
        cfg = self
        b, f_in, t, _ = spec.shape
        new_stats = jax.tree.map(lambda x: x, stats)  # structural copy

        # [B, F, T, 2] -> [B*T, F, 2] channels-last over freq
        x = spec.transpose(0, 2, 1, 3).reshape(b * t, f_in, 2)
        bw = self._bn_w_bt(b, t) if train else None

        # Encoder PreNet (strided reshape conv, stride folded into channels)
        x = self._strided_reshape(x)
        x, s = self._conv_bn_act(params["enc_pre"], stats["enc_pre"], x,
                                 train=train, bw=bw)
        if s is not None:
            new_stats["enc_pre"] = s
        skips = [x]

        for i, (p, st) in enumerate(zip(params["encoder"], stats["encoder"])):
            x_in = x
            k = cfg.kernel_size[1 + i]
            x, s = self._conv_bn_act(p, st, x, padding=(k - 1) // 2,
                                     train=train, bw=bw)
            if s is not None:
                new_stats["encoder"][i] = s
            skips.append(x)
            if cfg.resnet:
                x = x + x_in

        # RNNFormer PreNet: freq resample (linear on F axis) + 1x1 conv + BN
        x_res = x
        w_pre = params["rf_pre"]["lin"]["weight"]
        x = jnp.einsum("oF,nFc->noc", w_pre, x)
        x, s = self._conv_bn_act(params["rf_pre"], stats["rf_pre"], x,
                                 train=train, act=False, bw=bw)
        if s is not None:
            new_stats["rf_pre"] = s

        # [B*T, F', C'] -> [T, B, F', C']
        cc = x.shape[-1]
        x = x.reshape(b, t, self.block_freq, cc).transpose(1, 0, 2, 3)
        return x, x_res, skips, b, t, new_stats

    def _decode(
        self, params: Params, stats: Params, new_stats: Params, x: Array,
        x_res: Array, skips: tp.List[Array], b: int, t: int, f_in: int,
        train: bool = False,
    ) -> Array:
        """Everything after the block stack: x [T, B, F', C'] -> mask
        [B, F, T, 2]. Mutates new_stats for the post-block BNs in train."""
        cfg = self
        # [T, B, F', C'] -> [B*T, F', C']
        cc = x.shape[-1]
        x = x.transpose(1, 0, 2, 3).reshape(b * t, self.block_freq, cc)
        bw = self._bn_w_bt(b, t) if train else None
        w_post = params["rf_post"]["lin"]["weight"]
        x = jnp.einsum("oF,nFc->noc", w_post, x)
        x, s = self._conv_bn_act(params["rf_post"], stats["rf_post"], x,
                                 train=train, act=False, bw=bw)
        if s is not None:
            new_stats["rf_post"] = s
        if cfg.resnet:
            x = x + x_res

        # Decoder with skip concats
        for i, (p, st) in enumerate(zip(params["decoder"], stats["decoder"])):
            x_in = x
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            unit1 = {"conv": p["conv1"], "bn": p.get("bn1"), "gn": p.get("gn1")}
            unit2 = {"conv": p["conv2"], "bn": p.get("bn2"), "gn": p.get("gn2")}
            y, s1 = self._conv_bn_act(
                unit1, {"bn": st["bn1"]} if st and "bn1" in st else None,
                x, train=train, bw=bw)
            k = cfg.kernel_size[len(cfg.kernel_size) - 1 - i]
            y, s2 = self._conv_bn_act(
                unit2, {"bn": st["bn2"]} if st and "bn2" in st else None,
                y, padding=(k - 1) // 2, train=train, bw=bw)
            if s1 is not None:
                new_stats["decoder"][i] = {"bn1": s1["bn"], "bn2": s2["bn"]}
            x = y
            if cfg.resnet:
                x = x + x_in

        # Decoder PostNet
        x = jnp.concatenate([x, skips.pop()], axis=-1)
        x, s = self._conv_bn_act(params["dec_post"], stats["dec_post"], x,
                                 train=train, bw=bw)
        if s is not None:
            new_stats["dec_post"] = s
        x = self._scaled_convt(params["dec_post"]["convt"], x)  # [B*T, F, 2]

        mask = self.mask_act(x)
        mask = mask.reshape(b, t, f_in, 2).transpose(0, 2, 1, 3)  # [B, F, T, 2]
        return mask

    def _apply_block(self, bp: Params, bs: Params, x: Array, h0, train: bool):
        """_block_apply, rematerialised under train.remat: backward keeps
        only the block boundary and recomputes the GRU scan / attention
        internals, bounding activation memory to one block's working set."""
        if train and self.remat:
            fn = jax.checkpoint(
                lambda p, s, xx, hh: self._block_apply(p, s, xx, hh, True))
            return fn(bp, bs, x, h0)
        return self._block_apply(bp, bs, x, h0, train)

    def _block_apply(
        self,
        p: Params,
        s: Params,
        x: Array,
        h0: tp.Optional[Array],
        train: bool,
    ) -> tp.Tuple[Array, Array, tp.Optional[Params]]:
        """x: [T, B, F', C]. Reference: models/.../model.py:266-291."""
        rf = self.rf
        t, b, f, c = x.shape
        new_s = dict(s) if s else None
        bw = self._bn_w_tb() if train else None

        # --- time GRU ---
        x_in = x
        y = x
        if s is not None and "rnn_pre_norm" in s:
            y, st = fnn.batch_norm(None, s["rnn_pre_norm"], y, train=train,
                                   eps=rf.eps, weight=bw)
            new_s["rnn_pre_norm"] = st
        y = y.reshape(t, b * f, c)
        if h0 is None:
            h0 = jnp.zeros((b * f, c), x.dtype)
        y, h_t = fnn.gru(p["rnn"], y, h0)
        y = y.reshape(t, b, f, c)
        y = fnn.linear(p["rnn_fc"], y)
        if "rnn_post_norm" in p and p["rnn_post_norm"] is not None:
            y, st = fnn.batch_norm(p["rnn_post_norm"], s["rnn_post_norm"], y,
                                   train=train, eps=rf.eps, weight=bw)
            new_s["rnn_post_norm"] = st
        if rf.post_act:
            y = self.act(y)
        x = y + x_in

        # --- positional embedding (block 0 only) ---
        if "pe" in p:
            x = x + p["pe"]["weight"]

        # --- freq attention ---
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
        if "attn_post_norm" in p and p["attn_post_norm"] is not None:
            y, st = fnn.batch_norm(p["attn_post_norm"], s["attn_post_norm"], y,
                                   train=train, eps=rf.eps, weight=bw)
            new_s["attn_post_norm"] = st
        if rf.post_act:
            y = self.act(y)
        x = y + x_in
        return x, h_t, new_s

    # -- training graph (wav -> wav) -------------------------------------------

    @staticmethod
    def complex_mask_mul(spec: Array, mask: Array) -> Array:
        re = spec[..., 0] * mask[..., 0] - spec[..., 1] * mask[..., 1]
        im = spec[..., 0] * mask[..., 1] + spec[..., 1] * mask[..., 0]
        return jnp.stack([re, im], axis=-1)

    def forward(
        self, variables: Params, wav: Array, train: bool = False,
        row_mask: tp.Optional[Array] = None,
    ) -> tp.Tuple[Array, Array, Params]:
        """wav [B, T] -> (wav_hat [B, T], spec_hat compressed [B, F, T', 2],
        new_stats). Reference: models/.../model.py:728-735.

        row_mask [B] (1 real, 0 padded) excludes zero-padded batch rows from
        train-mode BN statistics (the reference never pads rows; see
        nn.batch_norm). Held on self for the duration of the trace so the
        internal BN call sites — which see folded [B*T,...] / [T,B,...]
        layouts — can derive their broadcast without threading a parameter
        through every override.
        """
        params, stats = variables["params"], variables["stats"]
        self._row_mask = row_mask if train else None
        try:
            spec = compressed_stft(
                wav, self.stft_cfg, self.input_compression,
                discard_last_freq_bin=True)
            mask, _, new_stats = self.model_forward(params, stats, spec,
                                                    train=train)
            spec_hat = self.complex_mask_mul(spec, mask)
            wav_hat = compressed_istft(
                spec_hat, self.stft_cfg, self.input_compression,
                discard_last_freq_bin=True, length=wav.shape[-1])
        finally:
            self._row_mask = None
        return wav_hat, spec_hat, new_stats

    def stft(self, wav: Array) -> Array:
        """Compressed STFT of a clean target (for losses)."""
        return compressed_stft(
            wav, self.stft_cfg, self.input_compression, discard_last_freq_bin=True)

    # -- streaming --------------------------------------------------------------

    def init_streaming_carry(self, batch: int, dtype=jnp.float32,
                             fused: bool = False) -> Params:
        """Carry pytree replacing the reference ONNX cache list
        (reference: scripts/export_onnx.py:38-58). fused=True returns the
        layout the fused Pallas stack step consumes (block carries stacked
        [NB, B*F, C]; variants with a different fused state override)."""
        carry = {
            "stft": init_stft_carry(self.stft_cfg, batch, dtype),
            "istft": init_istft_carry(self.stft_cfg, batch, dtype),
            "h": [self._block_carry_init(batch, dtype)
                  for _ in range(self.num_blocks)],
        }
        if fused:
            carry["h"] = jnp.stack(carry["h"])
        return carry

    def _block_carry_init(self, batch: int, dtype) -> Array:
        return jnp.zeros((batch * self.block_freq, self.block_channels), dtype)

    def _stream_front(self, carry: Params,
                      wav_hop: Array) -> tp.Tuple[Array, Array]:
        """Shared per-hop front end: STFT step + last-bin drop + compress.
        -> (spec [B, F, 1, 2], new stft cache)."""
        spec, stft_c = stft_streaming_step(wav_hop, carry["stft"],
                                           self.stft_cfg)
        spec = spec[:, :-1]  # drop last freq bin
        return compress(spec[:, :, None, :], self.input_compression), stft_c

    def _stream_back(self, spec: Array, mask: Array, carry: Params,
                     stft_c: Array, h_t) -> tp.Tuple[Params, Array]:
        """Shared per-hop back end: mask multiply + uncompress + last-bin
        re-append + iSTFT step."""
        spec_hat = self.complex_mask_mul(spec, mask)
        spec_hat = uncompress(spec_hat, self.input_compression)[:, :, 0, :]
        pad = jnp.zeros_like(spec_hat[:, :1])
        spec_hat = jnp.concatenate([spec_hat, pad], axis=1)
        wav_out, istft_c = istft_streaming_step(spec_hat, carry["istft"],
                                                self.stft_cfg)
        return {"stft": stft_c, "istft": istft_c, "h": h_t}, wav_out

    def streaming_step(
        self, variables: Params, carry: Params, wav_hop: Array
    ) -> tp.Tuple[Params, Array]:
        """One hop: wav_hop [B, hop] -> (new_carry, wav_out [B, hop]).

        Output is delayed n_fft - hop samples (same contract as the reference
        streaming graph, docs/docs/onnx.md)."""
        params, stats = variables["params"], variables["stats"]
        spec, stft_c = self._stream_front(carry, wav_hop)
        mask, h_t, _ = self.model_forward(params, stats, spec, h0=carry["h"],
                                          train=False)
        return self._stream_back(spec, mask, carry, stft_c, h_t)

    # -- fused-stack streaming (Pallas) -----------------------------------------

    def build_stack_plan(self, variables: Params, dtype=None) -> Params:
        """Pack FOLDED rf_blocks params for the fused Pallas stack kernel
        (ops/rnnformer_stack.py). `variables` must be Model.fold() output —
        the kernel implements only the deploy-time block form (no BN, no
        pre-norms, post_act=False)."""
        if self.rf.post_act:
            raise NotImplementedError("fused stack: post_act recipes")
        from ...ops.rnnformer_stack import plan_stack

        for bs in variables["stats"]["rf_blocks"]:
            if bs:  # non-empty stats == unfolded BN still present
                raise ValueError("build_stack_plan expects fold() output")
        plan = plan_stack(variables["params"]["rf_blocks"], self.block_freq,
                          self.rf.num_heads)
        if dtype is not None:
            plan = jax.tree.map(lambda a: a.astype(dtype), plan)
        return plan

    def model_forward_fused(
        self, variables: Params, plan: Params, spec: Array, h: Array
    ) -> tp.Tuple[Array, Array]:
        """model_forward (one frame, inference) with the block stack as one
        Pallas program — the spec2spec deploy form (reference:
        scripts/export_onnx_spec.py). spec: compressed [B, F, 1, 2];
        h: stacked [NB, B*F', C] GRU carries. Returns (mask [B, F, 1, 2],
        h_t stacked). Requires fold() output and build_stack_plan()."""
        from ...ops.rnnformer_stack import rnnformer_stack_step

        params, stats = variables["params"], variables["stats"]
        x, x_res, skips, b, t, _ = self._encode(params, stats, spec, train=False)
        y, h_t = rnnformer_stack_step(plan, x[0], h, self.rf.num_heads)
        mask = self._decode(params, stats, stats, y[None], x_res, skips, b, t,
                            spec.shape[1], train=False)
        return mask, h_t

    def streaming_step_fused(
        self, variables: Params, plan: Params, carry: Params, wav_hop: Array
    ) -> tp.Tuple[Params, Array]:
        """streaming_step with the block stack fused into one Pallas program
        — measured 163 -> 116 µs/frame for the 3-block stack at 256 streams
        on v5e (slope-timed; docs/performance.md). Math matches
        streaming_step on folded variables (tested)."""
        spec, stft_c = self._stream_front(carry, wav_hop)
        h = carry["h"]                     # stacked [NB, B*F', C]
        if isinstance(h, (list, tuple)):
            h = jnp.stack(h)
        mask, h_t = self.model_forward_fused(variables, plan, spec, h)
        return self._stream_back(spec, mask, carry, stft_c, h_t)

    def build_frame_plan(self, variables: Params, dtype=None) -> Params:
        """Pack FOLDED variables for the whole-frame fused kernel
        (ops/fused_frame.py) — encoder + rf_pre + block stack + rf_post +
        decoder + ConvT in ONE Pallas program. Raises ValueError outside
        the kernel's envelope (use build_stack_plan / XLA then)."""
        from ...ops.fused_frame import plan_frame

        return plan_frame(self, variables, dtype=dtype)

    def streaming_step_fused_frame(
        self, variables: Params, plan: Params, carry: Params, wav_hop: Array
    ) -> tp.Tuple[Params, Array]:
        """streaming_step with the ENTIRE spec->mask model as one Pallas
        program (ops/fused_frame.py); only the STFT/iSTFT and the complex
        mask multiply stay XLA. Math matches streaming_step on folded
        variables (tested) — but measured 1.8x SLOWER than
        streaming_step_fused (a kept negative result; see the
        ops/fused_frame.py docstring for the ablation). Use
        streaming_step_fused for deployment."""
        from ...ops.fused_frame import fused_frame_step

        spec, stft_c = self._stream_front(carry, wav_hop)
        x = self._strided_reshape(spec[:, :, 0, :])  # [B, F_enc+1, s*2]
        h = carry["h"]
        if isinstance(h, (list, tuple)):
            h = jnp.stack(h)
        mask8, h_t = fused_frame_step(
            plan, x, h, num_blocks=self.num_blocks,
            num_heads=self.rf.num_heads, n_enc=len(self.kernel_size) - 1,
            enc_ks=tuple(self.kernel_size[1:]), f_enc=self.freq,
            block_freq=self.block_freq, stride=self.stride,
            resnet=self.resnet, mask=self.mask_name)
        mask = mask8.reshape(mask8.shape[0], -1, 2)[:, :, None, :]  # [B,F0,1,2]
        return self._stream_back(spec, mask, carry, stft_c, h_t)

    def streaming_chunk(
        self, variables: Params, carry: Params, wav_chunk: Array
    ) -> tp.Tuple[Params, Array]:
        """C hops in, C hops out: identical math to C single-hop steps, but
        the encoder/decoder/attention run time-batched over the chunk and the
        GRU scans only the recurrence — the throughput form of streaming.
        wav_chunk: [B, hop*C]."""
        from ...functional import stft_streaming_chunk, istft_streaming_chunk

        params, stats = variables["params"], variables["stats"]
        spec, stft_c = stft_streaming_chunk(wav_chunk, carry["stft"],
                                            self.stft_cfg)
        spec = compress(spec[:, :-1], self.input_compression)  # [B,F,C,2]
        mask, h_t, _ = self.model_forward(params, stats, spec, h0=carry["h"],
                                          train=False)
        spec_hat = self.complex_mask_mul(spec, mask)
        spec_hat = uncompress(spec_hat, self.input_compression)
        pad = jnp.zeros_like(spec_hat[:, :1])
        spec_hat = jnp.concatenate([spec_hat, pad], axis=1)
        wav_out, istft_c = istft_streaming_chunk(spec_hat, carry["istft"],
                                                 self.stft_cfg)
        return {"stft": stft_c, "istft": istft_c, "h": h_t}, wav_out

    def stream(self, variables: Params, wav: Array,
               chunk_frames: int = 1, unroll: int = 4,
               fused_plan: tp.Optional[Params] = None) -> Array:
        """Whole-utterance streaming via one lax.scan over frames (or
        chunk_frames-sized blocks). wav [B, hop*T] -> [B, hop*T].

        `unroll` replicates the scan body (math-identical; the per-frame
        recurrence is unchanged) so XLA pipelines the small per-frame ops
        across frames — measured faster at many-stream batch sizes.
        `fused_plan` (build_stack_plan() on folded variables) swaps the
        block stack for the fused Pallas kernel."""
        b, length = wav.shape
        hop = self.hop_size
        t = length // hop
        if fused_plan is not None and chunk_frames > 1:
            raise ValueError(
                "fused_plan implies per-frame streaming (chunk_frames=1); "
                "a fused chunked scan is not implemented")
        if fused_plan is not None:
            hops = wav[:, : t * hop].reshape(b, t, hop).swapaxes(0, 1)
            carry0 = self.init_streaming_carry(b, wav.dtype, fused=True)

            def fstep(carry, x):
                carry, y = self.streaming_step_fused(variables, fused_plan,
                                                     carry, x)
                return carry, y

            _, outs = jax.lax.scan(fstep, carry0, hops, unroll=unroll)
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

    # -- deploy-time folding -----------------------------------------------------

    def fold(self, variables: Params) -> Params:
        """Strip weight-norm, merge BN into convs/FCs, fold pre-norms.

        Returns folded {"params", "stats"} usable by the same apply fns.
        Reference math: models/.../model.py:215-258 (block), :532-608 (convs).
        """
        params = jax.tree.map(lambda x: x, variables["params"])
        stats = variables["stats"]

        def plain(p: Params, name: str = "weight") -> Array:
            return fnn.maybe_wn_weight(p, name)

        def merge_conv_bn(conv: Params, bn_p: Params, bn_s: Params,
                          eps: float = 1e-5) -> Params:
            w = plain(conv)
            std = jnp.sqrt(bn_s["var"] + eps)
            g = bn_p["weight"] / std
            # scale along Cout (leading weight axis) whatever the conv rank
            # (time_kernel's encoder/decoder convs are [O, I, k_t, k_f])
            g_w = g.reshape(g.shape[0], *([1] * (w.ndim - 1)))
            return {
                "weight": w * g_w,
                "bias": bn_p["bias"] - bn_s["mean"] * g,
            }

        out: Params = {}
        out["enc_pre"] = {"conv": merge_conv_bn(
            params["enc_pre"]["conv"], params["enc_pre"]["bn"],
            stats["enc_pre"]["bn"])}
        out["encoder"] = [
            {"conv": merge_conv_bn(p["conv"], p["bn"], s["bn"])}
            for p, s in zip(params["encoder"], stats["encoder"])
        ]
        for name in ("rf_pre", "rf_post"):
            out[name] = {
                "lin": dict(params[name]["lin"]),
                "conv": merge_conv_bn(params[name]["conv"], params[name]["bn"],
                                      stats[name]["bn"]),
            }

        out["rf_blocks"] = [self._block_fold(bp, bs)
                            for bp, bs in zip(params["rf_blocks"],
                                              stats["rf_blocks"])]

        out["decoder"] = [
            {"conv1": merge_conv_bn(p["conv1"], p["bn1"], s["bn1"]),
             "conv2": merge_conv_bn(p["conv2"], p["bn2"], s["bn2"])}
            for p, s in zip(params["decoder"], stats["decoder"])
        ]

        convt = dict(params["dec_post"]["convt"])
        w = convt["weight"]
        if "scale" in convt:
            scale = convt["scale"]
            if self.final_scale == "exp":
                scale = jnp.exp(scale)
            if self.normalize_final_conv:
                w = w / jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(w))), 1e-12)
            w = w * scale
        convt_folded = {"weight": w, "bias": convt["bias"]}
        out["dec_post"] = {
            "conv": merge_conv_bn(params["dec_post"]["conv"],
                                  params["dec_post"]["bn"],
                                  stats["dec_post"]["bn"]),
            "convt": convt_folded,
        }

        # folded stats tree mirrors structure with empty dicts (no BN anywhere)
        folded_stats = {
            "enc_pre": {}, "encoder": [{} for _ in out["encoder"]],
            "rf_pre": {}, "rf_post": {},
            "rf_blocks": [{} for _ in out["rf_blocks"]],
            "decoder": [{} for _ in out["decoder"]], "dec_post": {},
        }
        return {"params": out, "stats": folded_stats}

    def _block_fold(self, bp: Params, bs: Params) -> Params:
        """Fold one block: post-BN into the fc, pre-norm into GRU/QKV inputs
        (reference: models/.../default/model.py:215-258)."""
        eps = self.rf.eps
        plain = fnn.maybe_wn_weight
        nb: Params = {}
        rnn = {k: plain(bp["rnn"], k) if k.startswith("weight") else bp["rnn"][k]
               for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")}
        qkv_w = plain(bp["attn"]["qkv"])
        qkv = {"weight": qkv_w}
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
            qkv = {"weight": qkv_w / std,
                   "bias": qkv_bias + qkv_w @ beta}
            rnn = fold_prenorm_into_rnn(rnn, bs["rnn_pre_norm"], eps)
        nb["rnn"] = rnn
        nb["attn"] = {"qkv": qkv}
        if "pe" in bp:
            nb["pe"] = bp["pe"]
        return nb

    # -- misc ---------------------------------------------------------------------

    def fixed_param_paths(self) -> tp.List[tp.Tuple[str, ...]]:
        """Param-tree paths that are buffers in the reference (not trained)."""
        fixed: tp.List[tp.Tuple[str, ...]] = []
        if self.pre_post_init is not None and self.pre_post_init.endswith("_fixed"):
            fixed.append(("rf_pre", "lin", "weight"))
            fixed.append(("rf_post", "lin", "weight"))
        if self.rf.positional_embedding == "fixed":
            fixed.append(("rf_blocks", "0", "pe", "weight"))
        return fixed

    def torch_name(self, path: tp.Tuple[str, ...]) -> tp.Optional[str]:
        """Map a param-tree path to the reference's torch parameter name so
        that `train.optimizer_groups` regexes from the reference configs
        apply unchanged (reference names: models/.../default/model.py:383-521;
        regex usage: configs/fastenhancer/t.yaml:88-109).

        Returns None for buffers (fixed pe / fixed filterbanks are excluded
        separately via fixed_param_paths)."""
        return _torch_name_default(path, self.tname_prepost, self.tname_block)

    def num_params(self, params: Params) -> int:
        """Trainable parameter count (fixed buffers excluded)."""
        fixed = set(self.fixed_param_paths())

        def path_key(path) -> tp.Tuple[str, ...]:
            out = []
            for p in path:
                if hasattr(p, "key"):
                    out.append(str(p.key))
                elif hasattr(p, "idx"):
                    out.append(str(p.idx))
            return tuple(out)

        n = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            if leaf is None or path_key(path) in fixed:
                continue
            n += leaf.size
        return n
