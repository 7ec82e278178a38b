"""StreamingEngine (fastenhancer_tpu/serving.py): slot-based dynamic batching.

The property that matters: a stream served through a busy engine — other
streams joining, leaving, and reusing its neighbours' slots — produces
exactly the output of an isolated `model.stream()` run. That proves both
slot isolation (no state bleed across the batch axis) and the generic
carry-reset (the inferred slot axes really do reinitialize the whole
per-stream state: STFT/iSTFT caches, GRU hiddens, rolling KV, conv caches).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastenhancer_tpu.models import get_model
from fastenhancer_tpu.serving import StreamingEngine

HOP = 256

T_KWARGS = dict(
    channels=24, kernel_size=[8, 3, 3], stride=4,
    rnnformer_kwargs=dict(num_blocks=2, channels=20, freq=16, num_heads=4,
                          eps=1.0e-5, positional_embedding="train",
                          attn_bias=False, post_act=False, pre_norm=False),
    pre_post_init="linear_fixed", n_fft=512, hop_size=HOP, win_size=512,
    window="hann", stft_normalized=False, mask=None, activation="SiLU",
    input_compression=0.3, normalize_final_conv=True, weight_norm=True)

DPT_KWARGS = dict(
    channels=16, kernel_size=[8, 3, 3], stride=4,
    dpt_kwargs=dict(num_blocks=2, channels=12, freq=16, num_heads=4,
                    eps=1.0e-5, lookbehind=7, positional_embedding="train",
                    attn_bias=False, post_act=False, pre_norm=False),
    pre_post_init="linear_fixed", n_fft=512, hop_size=HOP, win_size=512,
    window="hann", stft_normalized=False, mask=None, activation="SiLU",
    input_compression=0.3, normalize_final_conv=True, weight_norm=True,
    final_scale=True, final_scale_init="one")

TK_KWARGS = dict(
    channels=16, kernel_size_freq=[8, 3, 3], kernel_size_time=3, stride=4,
    rnnformer_kwargs=dict(num_blocks=2, channels=12, freq=16, num_heads=4,
                          eps=1.0e-5, positional_embedding="train",
                          attn_bias=False, post_act=False, pre_norm=False),
    pre_post_init="linear_fixed", n_fft=512, hop_size=HOP, win_size=512,
    window="hann", stft_normalized=False, mask=None, activation="SiLU",
    input_compression=0.3, normalize_final_conv=True, weight_norm=True,
    final_scale=True)

BSRNN_KWARGS = dict(num_channels=16, num_layers=2, bias=True, affine=True,
                    n_fft=512, hop_size=HOP, win_size=512, window="hann",
                    input_compression=0.3)

FSPEN_KWARGS = dict(channels=[4, 16, 32], kernel_size=[6, 8, 6],
                    stride=[2, 2, 2],
                    dpe_kwargs=dict(num_blocks=2, channels=16, freq=32,
                                    groups=8, norm="LayerNorm-FreqChannels"),
                    n_fft=512, hop_size=HOP, win_size=512, window="hann",
                    input_compression=0.3)

LISENNET_KWARGS = dict(num_channels=16, n_blocks=2, n_fft=512, hop_size=HOP,
                       win_size=512, input_compression=0.3)


def _wav(n_hops, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.5, 0.5, n_hops * HOP).astype(np.float32)


def _build(name, kwargs):
    model = get_model(name, **kwargs)
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


def _isolated(model, variables, wav):
    """Single-stream oracle: the tested stream() API (raw hop outputs are
    delayed n_fft-hop), delay-compensated to match
    StreamingEngine.run_stream's output alignment."""
    delay = model.stft_cfg.n_fft - model.stft_cfg.hop_size
    pad = -(-delay // HOP) * HOP
    padded = np.concatenate([wav, np.zeros(pad, np.float32)])
    out = np.asarray(model.stream(variables, jnp.asarray(padded[None])))[0]
    return out[delay:delay + len(wav)]


@pytest.mark.parametrize("name,kwargs", [
    ("fastenhancer.default", T_KWARGS),
    ("fastenhancer.dptransformer", DPT_KWARGS),
    ("fastenhancer.time_kernel", TK_KWARGS),
    ("bsrnn", BSRNN_KWARGS),
    ("fspen", FSPEN_KWARGS),
    ("lisennet", LISENNET_KWARGS),
])
def test_slot_isolation_and_reuse(name, kwargs):
    """Three streams interleaved through a capacity-3 engine with mid-run
    join/leave/slot-reuse must each match their isolated run."""
    model, variables = _build(name, kwargs)
    engine = StreamingEngine(model, variables, capacity=3)
    wav_a, wav_b, wav_c = _wav(8, 1), _wav(6, 2), _wav(5, 3)

    outs = {"a": [], "b": [], "c": []}
    ha = engine.open_stream()
    hb = engine.open_stream()
    # ticks 0-1: a+b together
    for i in range(2):
        o = engine.tick({ha: wav_a[i * HOP:(i + 1) * HOP],
                         hb: wav_b[i * HOP:(i + 1) * HOP]})
        outs["a"].append(o[ha])
        outs["b"].append(o[hb])
    # b leaves mid-stream; c joins (reuses b's slot — must see fresh state)
    engine.close_stream(hb)
    hc = engine.open_stream()
    assert engine._slot_of[hc] == 1  # really reusing the freed slot
    for i in range(5):
        o = engine.tick({ha: wav_a[(2 + i) * HOP:(3 + i) * HOP],
                         hc: wav_c[i * HOP:(i + 1) * HOP]})
        outs["a"].append(o[ha])
        outs["c"].append(o[hc])
    # a finishes its last hop alone (c receives silence this tick, which IS
    # its first drain tick — ticks advance every active stream in lockstep,
    # so c's tail must be collected from the same ticks)
    zeros = np.zeros(HOP, np.float32)
    o = engine.tick({ha: wav_a[7 * HOP:8 * HOP], hc: zeros})
    outs["a"].append(o[ha])
    outs["c"].append(o[hc])
    # now drain both delays together
    n_drain = -(-engine.delay_samples // HOP)
    for _ in range(n_drain):
        o = engine.tick({ha: zeros, hc: zeros})
        outs["a"].append(o[ha])
        outs["c"].append(o[hc])
    engine.close_stream(ha)
    engine.close_stream(hc)
    assert engine.active == 0

    delay = engine.delay_samples
    got_a = np.concatenate(outs["a"])[delay:delay + len(wav_a)]
    got_c = np.concatenate(outs["c"])[delay:delay + len(wav_c)]
    ref_a = _isolated(model, variables, wav_a)
    ref_c = _isolated(model, variables, wav_c)
    np.testing.assert_allclose(got_a, ref_a, atol=2e-5)
    np.testing.assert_allclose(got_c, ref_c, atol=2e-5)
    # b's partial output (never flushed) still matches its isolated prefix
    got_b = np.concatenate(outs["b"])[delay:]
    ref_b = _isolated(model, variables, wav_b)[:len(got_b)]
    np.testing.assert_allclose(got_b, ref_b, atol=2e-5)


def test_run_stream_convenience_and_silence_ticks():
    model, variables = _build("fastenhancer.default", T_KWARGS)
    engine = StreamingEngine(model, variables, capacity=2)
    h_bg = engine.open_stream()          # idle stream receiving silence
    h = engine.open_stream()
    wav = _wav(6, 7)
    got = engine.run_stream(h, wav)
    ref = _isolated(model, variables, wav)
    assert got.shape == ref.shape == wav.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)
    engine.close_stream(h)
    engine.close_stream(h_bg)


def test_capacity_and_handle_errors():
    model, variables = _build("fastenhancer.default", T_KWARGS)
    engine = StreamingEngine(model, variables, capacity=2)
    h1 = engine.open_stream()
    h2 = engine.open_stream()
    with pytest.raises(RuntimeError):
        engine.open_stream()
    engine.close_stream(h1)
    h3 = engine.open_stream()            # freed slot reusable
    with pytest.raises(KeyError):
        engine.tick({h1: np.zeros(HOP, np.float32)})   # closed handle
    with pytest.raises(ValueError):
        engine.tick({h3: np.zeros(HOP - 1, np.float32)})
    with pytest.raises(KeyError):
        engine.close_stream(12345)
    with pytest.raises(ValueError):
        StreamingEngine(model, variables, capacity=1)
    del h2


def test_multi_device_engine_matches_single_device():
    """Slots sharded over a 4-device mesh (virtual CPU devices) serve the
    same streams as the single-device engine — joins, silence ticks, leaves
    and slot reuse included."""
    assert len(jax.devices()) >= 4  # conftest forces 8 virtual devices
    model, variables = _build("fastenhancer.default", T_KWARGS)
    wav1, wav2 = _wav(6, 21), _wav(4, 22)

    def choreography(engine):
        outs = []
        h1 = engine.open_stream()
        h2 = engine.open_stream()
        for i in range(4):
            o = engine.tick({h1: wav1[i * HOP:(i + 1) * HOP],
                             h2: wav2[i * HOP:(i + 1) * HOP]})
            outs.append(np.stack([o[h1], o[h2]]))
        engine.close_stream(h2)
        h3 = engine.open_stream()        # slot reuse mid-run
        for i in range(2):
            o = engine.tick({h1: wav1[(4 + i) * HOP:(5 + i) * HOP],
                             h3: wav2[i * HOP:(i + 1) * HOP]})
            outs.append(np.stack([o[h1], o[h3]]))
        return np.concatenate(outs)

    ref = choreography(StreamingEngine(model, variables, capacity=4))
    got = choreography(StreamingEngine(model, variables, capacity=4,
                                       devices=4))
    np.testing.assert_allclose(got, ref, atol=1e-6)

    with pytest.raises(ValueError):
        StreamingEngine(model, variables, capacity=5, devices=4)


def test_fused_engine_join_after_tick_and_devices():
    """Regression: the fused step returns a STACKED block carry where
    init_streaming_carry provides a list — the engine must canonicalize
    before inferring the carry structure, or (a) opening a stream after the
    first tick and (b) fused + devices>1 both break on the structure
    mismatch."""
    model, variables = _build("fastenhancer.default", T_KWARGS)
    folded = model.fold(variables)
    wav = _wav(4, 31)

    # (a) open a second stream after ticking a fused engine
    eng = StreamingEngine(model, folded, capacity=2, fused=True)
    h1 = eng.open_stream()
    eng.tick({h1: wav[:HOP]})
    h2 = eng.open_stream()            # must not raise
    out = eng.tick({h1: wav[HOP:2 * HOP], h2: wav[:HOP]})
    assert np.isfinite(out[h1]).all() and np.isfinite(out[h2]).all()

    # (b) fused + devices: same choreography as single-device fused
    def run(engine):
        hh = engine.open_stream()
        return engine.run_stream(hh, wav)

    ref = run(StreamingEngine(model, folded, capacity=4, fused=True))
    got = run(StreamingEngine(model, folded, capacity=4, fused=True,
                              devices=4))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    with pytest.raises(ValueError):
        StreamingEngine(model, folded, capacity=len(jax.devices()) * 4,
                        devices=len(jax.devices()) * 2)


def test_fused_engine_matches_unfused():
    """fused=True (folded variables + the Pallas stack kernel, interpreted
    on CPU) serves the same streams as the XLA step."""
    model, variables = _build("fastenhancer.default", T_KWARGS)
    folded = model.fold(variables)
    wav = _wav(5, 9)
    plain = StreamingEngine(model, folded, capacity=2)
    fused = StreamingEngine(model, folded, capacity=2, fused=True)
    hp_bg = plain.open_stream()
    hp = plain.open_stream()
    hf_bg = fused.open_stream()
    hf = fused.open_stream()
    del hp_bg, hf_bg
    got_plain = plain.run_stream(hp, wav)
    got_fused = fused.run_stream(hf, wav)
    np.testing.assert_allclose(got_fused, got_plain, atol=5e-5)


def test_fused_engine_dpt_slot_reset_with_shared_pointer():
    """dptransformer fused serving: the carry is rotating-slot K/V caches
    plus ONE shared slot pointer. A stream joining mid-run (nonzero pointer,
    zeroed slot) must produce exactly the output it would get from a fresh
    engine — zero-key cold-start semantics are pointer-invariant — and the
    fused engine must match the unfused one throughout."""
    model, variables = _build("fastenhancer.dptransformer", DPT_KWARGS)
    folded = model.fold(variables)
    wav_bg, wav = _wav(14, 41), _wav(10, 42)

    fused = StreamingEngine(model, folded, capacity=2, fused=True)
    hb = fused.open_stream()
    # advance the shared pointer past a wrap (lookbehind=7) before joining
    for i in range(9):
        fused.tick({hb: wav_bg[i * HOP:(i + 1) * HOP]})
    hj = fused.open_stream()
    got = np.concatenate([
        fused.tick({hb: wav_bg[(9 + i) * HOP:(10 + i) * HOP],
                    hj: wav[i * HOP:(i + 1) * HOP]})[hj]
        for i in range(5)])

    plain = StreamingEngine(model, folded, capacity=2)
    hp = plain.open_stream()
    ref = np.concatenate([
        plain.tick({hp: wav[i * HOP:(i + 1) * HOP]})[hp] for i in range(5)])
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_fused_engine_time_kernel_matches_unfused():
    """time_kernel fused serving: the carry nests stacked GRU carries with
    2-D conv frame caches ({"h": {"h", "enc", "dec"}}); slot-axis inference
    and per-slot resets must handle the conv-cache leaves, and the fused
    engine must match the unfused one for a stream joining mid-run."""
    model, variables = _build("fastenhancer.time_kernel", TK_KWARGS)
    folded = model.fold(variables)
    wav_bg, wav = _wav(8, 51), _wav(6, 52)

    fused = StreamingEngine(model, folded, capacity=2, fused=True)
    hb = fused.open_stream()
    for i in range(3):  # make the background stream's conv caches non-zero
        fused.tick({hb: wav_bg[i * HOP:(i + 1) * HOP]})
    hj = fused.open_stream()
    got = np.concatenate([
        fused.tick({hb: wav_bg[(3 + i) * HOP:(4 + i) * HOP],
                    hj: wav[i * HOP:(i + 1) * HOP]})[hj]
        for i in range(5)])

    plain = StreamingEngine(model, folded, capacity=2)
    hp = plain.open_stream()
    ref = np.concatenate([
        plain.tick({hp: wav[i * HOP:(i + 1) * HOP]})[hp] for i in range(5)])
    np.testing.assert_allclose(got, ref, atol=5e-5)


LN_KWARGS = dict(
    channels=16, kernel_size=[8, 3, 3], stride=4,
    rnnformer_kwargs=dict(num_blocks=2, channels=12, freq=16, num_heads=4,
                          eps=1.0e-5, positional_embedding="train",
                          attn_bias=False, post_act=False, pre_norm=False),
    pre_post_init="linear_fixed", n_fft=512, hop_size=HOP, win_size=512,
    window="hann", stft_normalized=False, mask=None, activation="SiLU",
    input_compression=0.3, normalize_final_conv=True, weight_norm=True,
    final_scale=True, final_scale_init="one")


def test_fused_engine_ln_matches_unfused():
    """ln-ablation fused serving: the stack kernel applies the unfoldable
    sample-local LayerNorms inline (plan_stack ln_eps=...); the fused
    engine must match the unfused one for a stream joining mid-run."""
    import jax.numpy as jnp

    model, variables = _build("fastenhancer.ln", LN_KWARGS)
    # non-trivial LN affine params so the quirky diff + inv*w*b term bites
    rng = np.random.default_rng(60)
    for bp in variables["params"]["rf_blocks"]:
        for nm in ("rnn_post_norm", "attn_post_norm"):
            bp[nm]["ln"]["weight"] = jnp.asarray(
                1.0 + 0.2 * rng.standard_normal(12), jnp.float32)
            bp[nm]["ln"]["bias"] = jnp.asarray(
                0.1 * rng.standard_normal(12), jnp.float32)
    folded = model.fold(variables)
    wav_bg, wav = _wav(6, 61), _wav(5, 62)

    fused = StreamingEngine(model, folded, capacity=2, fused=True)
    hb = fused.open_stream()
    for i in range(3):
        fused.tick({hb: wav_bg[i * HOP:(i + 1) * HOP]})
    hj = fused.open_stream()
    got = np.concatenate([
        fused.tick({hb: wav_bg[(3 + i) * HOP:(4 + i) * HOP],
                    hj: wav[i * HOP:(i + 1) * HOP]})[hj]
        for i in range(3)])

    plain = StreamingEngine(model, folded, capacity=2)
    hp = plain.open_stream()
    ref = np.concatenate([
        plain.tick({hp: wav[i * HOP:(i + 1) * HOP]})[hp] for i in range(3)])
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_fused_engine_dprnn_unaligned_capacity_fails_fast(monkeypatch):
    """StreamingEngine(fused=True) must surface dprnn's sublane-alignment
    requirement at construction (model.validate_fused_batch hook), not
    from inside the kernel's tile selection on the first tick. On real
    TPU capacity 3/f32 has no aligned tile; on CPU interpret mode accepts
    any batch, so the kernel-side check is forced here."""
    import fastenhancer_tpu.ops.dprnn_stack as mod

    kwargs = dict(
        channels=16, kernel_size=[8, 3, 3], stride=4,
        dprnn_kwargs=dict(num_blocks=2, channels=12, channels_frnn=6,
                          freq=16),
        pre_post_init="linear_fixed", n_fft=512, hop_size=HOP, win_size=512,
        window="hann", activation="SiLU", input_compression=0.3,
        weight_norm=True, final_scale=True)
    model, variables = _build("fastenhancer.dprnn", kwargs)
    folded = model.fold(variables)
    monkeypatch.setattr(mod, "supports_batch", lambda *a, **k: False)
    with pytest.raises(ValueError, match="aligned capacity"):
        StreamingEngine(model, folded, capacity=3, fused=True)


def test_fused_engine_dprnn_matches_unfused():
    """dprnn fused serving (f-major stacked carry [NB, F, B, C]: slot axis
    is the third) must match the unfused engine for a stream joining
    mid-run; CPU interpret mode accepts capacity 2."""
    kwargs = dict(
        channels=16, kernel_size=[8, 3, 3], stride=4,
        dprnn_kwargs=dict(num_blocks=2, channels=12, channels_frnn=6,
                          freq=16),
        pre_post_init="linear_fixed", n_fft=512, hop_size=HOP, win_size=512,
        window="hann", activation="SiLU", input_compression=0.3,
        weight_norm=True, final_scale=True)
    model, variables = _build("fastenhancer.dprnn", kwargs)
    folded = model.fold(variables)
    wav_bg, wav = _wav(6, 71), _wav(5, 72)

    fused = StreamingEngine(model, folded, capacity=2, fused=True)
    hb = fused.open_stream()
    for i in range(3):
        fused.tick({hb: wav_bg[i * HOP:(i + 1) * HOP]})
    hj = fused.open_stream()
    got = np.concatenate([
        fused.tick({hb: wav_bg[(3 + i) * HOP:(4 + i) * HOP],
                    hj: wav[i * HOP:(i + 1) * HOP]})[hj]
        for i in range(3)])

    plain = StreamingEngine(model, folded, capacity=2)
    hp = plain.open_stream()
    ref = np.concatenate([
        plain.tick({hp: wav[i * HOP:(i + 1) * HOP]})[hp] for i in range(3)])
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_fused_engine_devices_validates_per_shard(monkeypatch):
    """With devices>1 the fused step runs per shard at capacity//devices —
    that is the batch the construction-time validate_fused_batch hook must
    check, not the full capacity (review r5: an aligned capacity with an
    unaligned per-shard batch previously died inside the kernel's tile
    selection on the first tick)."""
    import fastenhancer_tpu.ops.bsrnn_stack as mod

    model, variables = _build("bsrnn", BSRNN_KWARGS)
    folded = model.fold(variables)
    monkeypatch.setattr(mod, "supports_batch",
                        lambda b, *a, **k: b >= 4)  # per-shard 2 -> reject
    with pytest.raises(ValueError, match="aligned capacity"):
        StreamingEngine(model, folded, capacity=4, fused=True, devices=2)
    StreamingEngine(model, folded, capacity=4, fused=True)  # shard 4: ok


def test_engine_rejects_mismatched_variable_dtype():
    """A bf16 engine over f32 variables used to die later with an opaque
    conv/Pallas dtype error (and scripts/serve.py --dtype bf16 hit exactly
    that by never casting); the engine now states the contract at
    construction."""
    import jax.numpy as jnp

    model, variables = _build("fastenhancer.default", T_KWARGS)
    with pytest.raises(ValueError, match="cast to that dtype"):
        StreamingEngine(model, variables, capacity=2, dtype=jnp.bfloat16)
    # cast pytree constructs fine
    cast = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, variables, is_leaf=lambda a: a is None)
    StreamingEngine(model, cast, capacity=2, dtype=jnp.bfloat16)
