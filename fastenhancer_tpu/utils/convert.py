"""Torch checkpoint -> param-pytree conversion for the fastenhancer family.

Converts a reference `state_dict` (as produced by the PyTorch repo's
checkpoints, reference: wrappers/ns.py:323-336) into our {"params","stats"}
trees, including weight-norm parametrization pairs (original0/original1 ->
{g,v}) and BatchNorm running statistics. Works on numpy arrays so torch is
only an optional dependency of the conversion entry point.
"""
from __future__ import annotations

import re
import typing as tp

import jax.numpy as jnp
import numpy as np

Params = tp.Dict[str, tp.Any]


def _to_np(sd: tp.Mapping[str, tp.Any]) -> tp.Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):  # torch tensor
            v = v.detach().cpu().numpy()
        # copy: torch .numpy() shares memory with the live tensor, and a CPU
        # jnp.asarray may alias it — later in-place torch updates (e.g. BN
        # running stats during a train-mode forward) would corrupt our tree.
        out[k] = np.array(v, copy=True)
    return out


def _bn(sd: tp.Dict[str, np.ndarray], prefix: str, affine: bool = True
        ) -> tp.Tuple[tp.Optional[Params], Params]:
    stats = {"mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
             "var": jnp.asarray(sd[f"{prefix}.running_var"])}
    if not affine:
        return None, stats
    params = {"weight": jnp.asarray(sd[f"{prefix}.weight"]),
              "bias": jnp.asarray(sd[f"{prefix}.bias"])}
    return params, stats


def _maybe_wn(sd: tp.Dict[str, np.ndarray], base: str, weight_name: str = "weight"
              ) -> tp.Any:
    """Return {g,v} if the key is weight-norm parametrized, else the weight."""
    p0 = f"{base}.parametrizations.{weight_name}.original0"
    if p0 in sd:
        return {"g": jnp.asarray(sd[p0]),
                "v": jnp.asarray(sd[f"{base}.parametrizations.{weight_name}.original1"])}
    return jnp.asarray(sd[f"{base}.{weight_name}"])


def convert_fastenhancer_default(
    state_dict: tp.Mapping[str, tp.Any],
    num_blocks: int,
    num_encoder: int,
    pre_norm: bool = False,
) -> Params:
    """Reference `fastenhancer.default` Model/ONNXModel state_dict -> variables.

    Key layout (reference: models/fastenhancer/default/model.py:383-521):
      enc_pre.{0,1}, encoder.{i}.{0,1}, rf_pre.{0,1,2}, rf_block.{i}.*,
      rf_post.{0,1,2}, decoder.{i}.{0,1,3,4}, dec_post.{0,1,3}.
    """
    sd = _to_np(state_dict)
    params: Params = {}
    stats: Params = {}

    def conv_bn(conv_key: str, bn_key: str) -> tp.Tuple[Params, Params]:
        bn_p, bn_s = _bn(sd, bn_key)
        return ({"conv": {"weight": jnp.asarray(sd[f"{conv_key}.weight"])},
                 "bn": bn_p}, {"bn": bn_s})

    params["enc_pre"], stats["enc_pre"] = conv_bn("enc_pre.0", "enc_pre.1")
    params["encoder"], stats["encoder"] = [], []
    for i in range(num_encoder):
        p, s = conv_bn(f"encoder.{i}.0", f"encoder.{i}.1")
        params["encoder"].append(p)
        stats["encoder"].append(s)

    for name in ("rf_pre", "rf_post"):
        p, s = conv_bn(f"{name}.1", f"{name}.2")
        params[name] = {"lin": {"weight": jnp.asarray(sd[f"{name}.0.weight"])}, **p}
        stats[name] = s

    params["rf_blocks"], stats["rf_blocks"] = [], []
    for i in range(num_blocks):
        b = f"rf_block.{i}"
        rnn = {
            "weight_ih": _maybe_wn(sd, f"{b}.rnn", "weight_ih_l0"),
            "weight_hh": _maybe_wn(sd, f"{b}.rnn", "weight_hh_l0"),
            "bias_ih": jnp.asarray(sd[f"{b}.rnn.bias_ih_l0"]),
            "bias_hh": jnp.asarray(sd[f"{b}.rnn.bias_hh_l0"]),
        }
        qkv: Params = {"weight": _maybe_wn(sd, f"{b}.attn.qkv")}
        if f"{b}.attn.qkv.bias" in sd:
            qkv["bias"] = jnp.asarray(sd[f"{b}.attn.qkv.bias"])
        rnn_norm_p, rnn_norm_s = _bn(sd, f"{b}.rnn_post_norm")
        attn_norm_p, attn_norm_s = _bn(sd, f"{b}.attn_post_norm")
        bp: Params = {
            "rnn": rnn,
            "rnn_fc": {"weight": jnp.asarray(sd[f"{b}.rnn_fc.weight"])},
            "rnn_post_norm": rnn_norm_p,
            "attn": {"qkv": qkv},
            "attn_fc": {"weight": jnp.asarray(sd[f"{b}.attn_fc.weight"])},
            "attn_post_norm": attn_norm_p,
        }
        bs: Params = {"rnn_post_norm": rnn_norm_s, "attn_post_norm": attn_norm_s}
        if pre_norm:
            _, bs["rnn_pre_norm"] = _bn(sd, f"{b}.rnn_pre_norm", affine=False)
            _, bs["attn_pre_norm"] = _bn(sd, f"{b}.attn_pre_norm", affine=False)
        if f"{b}.pe" in sd:
            bp["pe"] = {"weight": jnp.asarray(sd[f"{b}.pe"])}
        params["rf_blocks"].append(bp)
        stats["rf_blocks"].append(bs)

    params["decoder"], stats["decoder"] = [], []
    for i in range(num_encoder):
        p1, s1 = conv_bn(f"decoder.{i}.0", f"decoder.{i}.1")
        p2, s2 = conv_bn(f"decoder.{i}.3", f"decoder.{i}.4")
        params["decoder"].append({"conv1": p1["conv"], "bn1": p1["bn"],
                                  "conv2": p2["conv"], "bn2": p2["bn"]})
        stats["decoder"].append({"bn1": s1["bn"], "bn2": s2["bn"]})

    p1, s1 = conv_bn("dec_post.0", "dec_post.1")
    convt: Params = {"weight": jnp.asarray(sd["dec_post.3.weight"]),
                     "bias": jnp.asarray(sd["dec_post.3.bias"])}
    if "dec_post.3.scale" in sd:
        convt["scale"] = jnp.asarray(sd["dec_post.3.scale"])
    params["dec_post"] = {**p1, "convt": convt}
    stats["dec_post"] = s1
    return {"params": params, "stats": stats}


def _gru(sd, base: str, suffix: str = "_l0") -> Params:
    return {
        "weight_ih": _maybe_wn(sd, base, f"weight_ih{suffix}"),
        "weight_hh": _maybe_wn(sd, base, f"weight_hh{suffix}"),
        "bias_ih": jnp.asarray(sd[f"{base}.bias_ih{suffix}"]),
        "bias_hh": jnp.asarray(sd[f"{base}.bias_hh{suffix}"]),
    }


def _bigru(sd, base: str) -> Params:
    return {"fwd": _gru(sd, base, "_l0"), "bwd": _gru(sd, base, "_l0_reverse")}


def convert_fastenhancer_noncausal(
    state_dict, num_blocks: int, num_encoder: int, pre_norm: bool = False,
) -> Params:
    """Bidirectional-GRU variant: rnn gains *_l0_reverse weights
    (reference: models/fastenhancer/noncausal/model.py:186-221)."""
    out = convert_fastenhancer_default(state_dict, num_blocks, num_encoder,
                                       pre_norm)
    sd = _to_np(state_dict)
    for i in range(num_blocks):
        out["params"]["rf_blocks"][i]["rnn"] = _bigru(sd, f"rf_block.{i}.rnn")
    return out


def convert_fastenhancer_dprnn(
    state_dict, num_blocks: int, num_encoder: int, pre_norm: bool = False,
) -> Params:
    """DPRNN ablation (reference: models/fastenhancer/dprnn/model.py):
    module prefixes dprnn_pre/dprnn_post/dprnn_block.{i}.{trnn,frnn,...}."""
    sd = _to_np(state_dict)
    params: Params = {}
    stats: Params = {}

    def conv_bn(conv_key: str, bn_key: str):
        bn_p, bn_s = _bn(sd, bn_key)
        return ({"conv": {"weight": jnp.asarray(sd[f"{conv_key}.weight"])},
                 "bn": bn_p}, {"bn": bn_s})

    params["enc_pre"], stats["enc_pre"] = conv_bn("enc_pre.0", "enc_pre.1")
    params["encoder"], stats["encoder"] = [], []
    for i in range(num_encoder):
        p, s = conv_bn(f"encoder.{i}.0", f"encoder.{i}.1")
        params["encoder"].append(p)
        stats["encoder"].append(s)
    for ours, theirs in (("rf_pre", "dprnn_pre"), ("rf_post", "dprnn_post")):
        p, s = conv_bn(f"{theirs}.1", f"{theirs}.2")
        params[ours] = {"lin": {"weight": jnp.asarray(sd[f"{theirs}.0.weight"])},
                        **p}
        stats[ours] = s

    params["rf_blocks"], stats["rf_blocks"] = [], []
    for i in range(num_blocks):
        b = f"dprnn_block.{i}"
        t_norm_p, t_norm_s = _bn(sd, f"{b}.trnn_post_norm")
        f_norm_p, f_norm_s = _bn(sd, f"{b}.frnn_post_norm")
        bp: Params = {
            "trnn": _gru(sd, f"{b}.trnn"),
            "trnn_fc": {"weight": jnp.asarray(sd[f"{b}.trnn_fc.weight"])},
            "trnn_post_norm": t_norm_p,
            "frnn": _bigru(sd, f"{b}.frnn"),
            "frnn_fc": {"weight": jnp.asarray(sd[f"{b}.frnn_fc.weight"])},
            "frnn_post_norm": f_norm_p,
        }
        bs: Params = {"trnn_post_norm": t_norm_s, "frnn_post_norm": f_norm_s}
        if pre_norm:
            _, bs["trnn_pre_norm"] = _bn(sd, f"{b}.trnn_pre_norm", affine=False)
            _, bs["frnn_pre_norm"] = _bn(sd, f"{b}.frnn_pre_norm", affine=False)
        params["rf_blocks"].append(bp)
        stats["rf_blocks"].append(bs)

    params["decoder"], stats["decoder"] = [], []
    for i in range(num_encoder):
        p1, s1 = conv_bn(f"decoder.{i}.0", f"decoder.{i}.1")
        p2, s2 = conv_bn(f"decoder.{i}.3", f"decoder.{i}.4")
        params["decoder"].append({"conv1": p1["conv"], "bn1": p1["bn"],
                                  "conv2": p2["conv"], "bn2": p2["bn"]})
        stats["decoder"].append({"bn1": s1["bn"], "bn2": s2["bn"]})
    p1, s1 = conv_bn("dec_post.0", "dec_post.1")
    convt: Params = {"weight": jnp.asarray(sd["dec_post.3.weight"]),
                     "bias": jnp.asarray(sd["dec_post.3.bias"])}
    if "dec_post.3.scale" in sd:
        convt["scale"] = jnp.asarray(sd["dec_post.3.scale"])
    params["dec_post"] = {**p1, "convt": convt}
    stats["dec_post"] = s1
    return {"params": params, "stats": stats}


def convert_fastenhancer_ln(
    state_dict, num_blocks: int, num_encoder: int, pre_norm: bool = False,
) -> Params:
    """ln ablation: GroupNorm/LayerNorm params instead of BN stats
    (reference: models/fastenhancer/ln/model.py)."""
    sd = _to_np(state_dict)
    params: Params = {}

    def conv_gn(conv_key: str, gn_key: str) -> Params:
        conv = {"weight": jnp.asarray(sd[f"{conv_key}.weight"])}
        if f"{conv_key}.bias" in sd:  # ln convs keep their biases
            conv["bias"] = jnp.asarray(sd[f"{conv_key}.bias"])
        return {"conv": conv,
                "gn": {"weight": jnp.asarray(sd[f"{gn_key}.weight"]),
                       "bias": jnp.asarray(sd[f"{gn_key}.bias"])}}

    params["enc_pre"] = conv_gn("enc_pre.0", "enc_pre.1")
    params["encoder"] = [conv_gn(f"encoder.{i}.0", f"encoder.{i}.1")
                         for i in range(num_encoder)]
    for name in ("rf_pre", "rf_post"):
        params[name] = {"lin": {"weight": jnp.asarray(sd[f"{name}.0.weight"])},
                        **conv_gn(f"{name}.1", f"{name}.2")}
    params["rf_blocks"] = []
    for i in range(num_blocks):
        b = f"rf_block.{i}"
        qkv: Params = {"weight": _maybe_wn(sd, f"{b}.attn.qkv")}
        if f"{b}.attn.qkv.bias" in sd:
            qkv["bias"] = jnp.asarray(sd[f"{b}.attn.qkv.bias"])
        bp: Params = {
            "rnn": _gru(sd, f"{b}.rnn"),
            "rnn_fc": {"weight": jnp.asarray(sd[f"{b}.rnn_fc.weight"])},
            "rnn_post_norm": {"ln": {
                "weight": jnp.asarray(sd[f"{b}.rnn_post_norm.weight"]),
                "bias": jnp.asarray(sd[f"{b}.rnn_post_norm.bias"])}},
            "attn": {"qkv": qkv},
            "attn_fc": {"weight": jnp.asarray(sd[f"{b}.attn_fc.weight"])},
            "attn_post_norm": {"ln": {
                "weight": jnp.asarray(sd[f"{b}.attn_post_norm.weight"]),
                "bias": jnp.asarray(sd[f"{b}.attn_post_norm.bias"])}},
        }
        if pre_norm:
            bp["rnn_pre_norm"] = {"ln": None}
            bp["attn_pre_norm"] = {"ln": None}
        if f"{b}.pe" in sd:
            bp["pe"] = {"weight": jnp.asarray(sd[f"{b}.pe"])}
        params["rf_blocks"].append(bp)
    params["decoder"] = [
        {"conv1": conv_gn(f"decoder.{i}.0", f"decoder.{i}.1")["conv"],
         "bn1": None,
         "gn1": conv_gn(f"decoder.{i}.0", f"decoder.{i}.1")["gn"],
         "conv2": conv_gn(f"decoder.{i}.3", f"decoder.{i}.4")["conv"],
         "bn2": None,
         "gn2": conv_gn(f"decoder.{i}.3", f"decoder.{i}.4")["gn"]}
        for i in range(num_encoder)
    ]
    convt: Params = {"weight": jnp.asarray(sd["dec_post.3.weight"]),
                     "bias": jnp.asarray(sd["dec_post.3.bias"])}
    if "dec_post.3.scale" in sd:
        convt["scale"] = jnp.asarray(sd["dec_post.3.scale"])
    params["dec_post"] = {**conv_gn("dec_post.0", "dec_post.1"),
                          "convt": convt}
    stats = {"enc_pre": {}, "encoder": [{} for _ in range(num_encoder)],
             "rf_pre": {}, "rf_post": {},
             "rf_blocks": [{} for _ in range(num_blocks)],
             "decoder": [{} for _ in range(num_encoder)], "dec_post": {}}
    return {"params": params, "stats": stats}


def convert_fastenhancer_dpt(
    state_dict, num_blocks: int, num_encoder: int, pre_norm: bool = False,
) -> Params:
    """dptransformer ablation (reference: models/fastenhancer/dptransformer/
    model.py): dpt_pre/dpt_post/dpt_block.{i}.{time_attn,freq_attn,...} and a
    model-level relative position bias `pe` [NH, L+1]."""
    sd = _to_np(state_dict)
    params: Params = {}
    stats: Params = {}

    def conv_bn(conv_key: str, bn_key: str):
        bn_p, bn_s = _bn(sd, bn_key)
        return ({"conv": {"weight": jnp.asarray(sd[f"{conv_key}.weight"])},
                 "bn": bn_p}, {"bn": bn_s})

    params["enc_pre"], stats["enc_pre"] = conv_bn("enc_pre.0", "enc_pre.1")
    params["encoder"], stats["encoder"] = [], []
    for i in range(num_encoder):
        p, s = conv_bn(f"encoder.{i}.0", f"encoder.{i}.1")
        params["encoder"].append(p)
        stats["encoder"].append(s)
    for ours, theirs in (("rf_pre", "dpt_pre"), ("rf_post", "dpt_post")):
        p, s = conv_bn(f"{theirs}.1", f"{theirs}.2")
        params[ours] = {"lin": {"weight": jnp.asarray(sd[f"{theirs}.0.weight"])},
                        **p}
        stats[ours] = s

    params["time_pe"] = {"weight": jnp.asarray(sd["pe"])}
    params["rf_blocks"], stats["rf_blocks"] = [], []
    for i in range(num_blocks):
        b = f"dpt_block.{i}"
        bp: Params = {}
        bs: Params = {}
        for which in ("time", "freq"):
            qkv: Params = {"weight": _maybe_wn(sd, f"{b}.{which}_attn.qkv")}
            if f"{b}.{which}_attn.qkv.bias" in sd:
                qkv["bias"] = jnp.asarray(sd[f"{b}.{which}_attn.qkv.bias"])
            norm_p, norm_s = _bn(sd, f"{b}.{which}_post_norm")
            bp[f"{which}_attn"] = {"qkv": qkv}
            bp[f"{which}_fc"] = {
                "weight": jnp.asarray(sd[f"{b}.{which}_fc.weight"])}
            bp[f"{which}_post_norm"] = norm_p
            bs[f"{which}_post_norm"] = norm_s
            if pre_norm:
                _, bs[f"{which}_pre_norm"] = _bn(sd, f"{b}.{which}_pre_norm",
                                                 affine=False)
        if f"{b}.pe" in sd:
            bp["pe"] = {"weight": jnp.asarray(sd[f"{b}.pe"])}
        params["rf_blocks"].append(bp)
        stats["rf_blocks"].append(bs)

    params["decoder"], stats["decoder"] = [], []
    for i in range(num_encoder):
        p1, s1 = conv_bn(f"decoder.{i}.0", f"decoder.{i}.1")
        p2, s2 = conv_bn(f"decoder.{i}.3", f"decoder.{i}.4")
        params["decoder"].append({"conv1": p1["conv"], "bn1": p1["bn"],
                                  "conv2": p2["conv"], "bn2": p2["bn"]})
        stats["decoder"].append({"bn1": s1["bn"], "bn2": s2["bn"]})
    p1, s1 = conv_bn("dec_post.0", "dec_post.1")
    convt: Params = {"weight": jnp.asarray(sd["dec_post.3.weight"]),
                     "bias": jnp.asarray(sd["dec_post.3.bias"])}
    if "dec_post.3.scale" in sd:
        convt["scale"] = jnp.asarray(sd["dec_post.3.scale"])
    params["dec_post"] = {**p1, "convt": convt}
    stats["dec_post"] = s1
    return {"params": params, "stats": stats}


def convert_checkpoint(
    ckpt_or_state_dict: tp.Mapping[str, tp.Any],
    model_name: str,
    model_kwargs: tp.Mapping[str, tp.Any],
) -> Params:
    """Top-level entry: accepts either a full reference checkpoint dict
    ({"model": state_dict, ...}) or a bare state_dict."""
    sd = ckpt_or_state_dict
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    # strip a possible DDP "module." prefix
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}
    n_enc = len(model_kwargs.get("kernel_size",
                                 model_kwargs.get("kernel_size_freq",
                                                  [8, 3, 3]))) - 1
    if model_name == "fastenhancer.dptransformer":
        cfg = model_kwargs.get("dpt_kwargs", {})
        return convert_fastenhancer_dpt(
            sd, num_blocks=cfg.get("num_blocks", 3), num_encoder=n_enc,
            pre_norm=cfg.get("pre_norm", False))
    if model_name == "fastenhancer.time_kernel":
        rf = model_kwargs.get("rnnformer_kwargs", {})
        out = convert_fastenhancer_default(
            sd, num_blocks=rf.get("num_blocks", 3), num_encoder=n_enc,
            pre_norm=rf.get("pre_norm", False))
        # 1x1 Conv2d weights [O,I,1,1] -> per-frame conv1d [O,I,1];
        # encoder/decoder causal convs keep their [O,I,kt,kf] 4-D shape.
        p = out["params"]
        for name in ("rf_pre", "rf_post"):
            w = p[name]["conv"]["weight"]
            p[name]["conv"]["weight"] = w.reshape(w.shape[0], w.shape[1], 1)
        for unit in p["decoder"]:
            w = unit["conv1"]["weight"]
            unit["conv1"]["weight"] = w.reshape(w.shape[0], w.shape[1], 1)
        return out
    if model_name in ("fastenhancer.default", "fastenhancer.conv_stft"):
        rf = model_kwargs.get("rnnformer_kwargs", {})
        return convert_fastenhancer_default(
            sd, num_blocks=rf.get("num_blocks", 3), num_encoder=n_enc,
            pre_norm=rf.get("pre_norm", False))
    if model_name == "fastenhancer.noncausal":
        rf = model_kwargs.get("rnnformer_kwargs", {})
        return convert_fastenhancer_noncausal(
            sd, num_blocks=rf.get("num_blocks", 3), num_encoder=n_enc,
            pre_norm=rf.get("pre_norm", False))
    if model_name == "fastenhancer.dprnn":
        dp = model_kwargs.get("dprnn_kwargs", {})
        return convert_fastenhancer_dprnn(
            sd, num_blocks=dp.get("num_blocks", 3), num_encoder=n_enc,
            pre_norm=dp.get("pre_norm", False))
    if model_name == "fastenhancer.ln":
        rf = model_kwargs.get("rnnformer_kwargs", {})
        return convert_fastenhancer_ln(
            sd, num_blocks=rf.get("num_blocks", 3), num_encoder=n_enc,
            pre_norm=rf.get("pre_norm", False))
    raise NotImplementedError(f"no converter for model {model_name!r} yet")
