"""Shard pipeline: shar reading, bucketing, mixer + segmental_rms parity."""
import gzip
import io
import json
import os
import sys
import tarfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastenhancer_tpu.data.shard import (
    ShardSource, WeightedMux, CyclicBuffer, ShardDataset,
)
from fastenhancer_tpu.data.shard_mixer import (
    DynamicMixer, batch_convolve_rir, get_early_rir, get_weighted_rir,
    get_rts_rir,
)
from fastenhancer_tpu.data.audio_io import write_wav
from fastenhancer_tpu.ops import segmental_rms
from fastenhancer_tpu.utils.hparams import HParams

SR = 16000


def _load_ref_shard():
    """Import the reference shard module read-only (lhotse/triton stubbed;
    only the pure-math mixer classes are exercised)."""
    import importlib
    import types

    if "triton" not in sys.modules:
        triton = types.ModuleType("triton")
        triton.jit = lambda fn=None, **kw: (fn if fn else (lambda f: f))
        triton.language = types.ModuleType("triton.language")
        triton.language.constexpr = int
        sys.modules["triton"] = triton
        sys.modules["triton.language"] = triton.language
    stubs = {
        "lhotse": {"CutSet": object},
        "lhotse.cut": {"Cut": object, "MonoCut": object},
        "lhotse.dataset": {"DynamicBucketingSampler": object},
        # reference utils/__init__ pulls the metric stack; stub the missing
        # external deps (we never call those paths)
        "torchaudio": {},
        "torchaudio.transforms": {"Resample": object},
        "pesq": {"pesq": lambda *a, **k: 0.0},
        "pystoi": {"stoi": lambda *a, **k: 0.0},
        "librosa": {},
        "librosa.filters": {"mel": lambda **kw: np.zeros((1, 1))},
        "matplotlib_stub_unused": {},
    }
    installed = []
    for name, attrs in stubs.items():
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            installed.append(name)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        return importlib.import_module("utils.data.shard_on_the_fly")
    except Exception as e:
        pytest.skip(f"reference shard module not importable: {e}")
    finally:
        # drop OUR stubs so later tests in the same process see the real
        # import state (a fake `pesq` module left behind flips
        # metrics.pesq_provider() expectations); the reference module
        # keeps direct references to them
        for name in installed:
            sys.modules.pop(name, None)


def _wav_payload(wav):
    import wave as wave_mod
    buf = io.BytesIO()
    pcm = np.clip(wav * 32768, -32768, 32767).astype("<i2")
    with wave_mod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SR)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


# parallel-field content is a recognizable transform of the recording so
# tests can assert which variant the pipeline picked
FIELD_GAIN = {"codec": 0.5, "echo": 0.25}


def _make_shard_dir(root, name, n_shards=2, cuts_per_shard=4, seed=0,
                    dur_range=(0.6, 2.0), custom=None, extra_fields=()):
    d = root / name
    d.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    for s in range(n_shards):
        metas = []
        tars = {f: tarfile.open(d / f"{f}.{s:06d}.tar", "w")
                for f in ("recording", *extra_fields)}
        for c in range(cuts_per_shard):
            cid = f"{name}-{s}-{c}"
            dur = float(rng.uniform(*dur_range))
            wav = (rng.standard_normal(int(dur * SR)) * 0.1).astype(
                np.float32)
            for field, tar in tars.items():
                data = _wav_payload(wav * FIELD_GAIN.get(field, 1.0))
                info = tarfile.TarInfo(f"{cid}.wav")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
            meta = {"id": cid, "duration": dur}
            if custom:
                meta["custom"] = custom
            metas.append(meta)
        for tar in tars.values():
            tar.close()
        with gzip.open(d / f"cuts.{s:06d}.jsonl.gz", "wt") as f:
            for m in metas:
                f.write(json.dumps(m) + "\n")
    return str(d)


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    root = tmp_path_factory.mktemp("shards")
    return {
        "speech": _make_shard_dir(root, "speech", seed=1),
        "speech2": _make_shard_dir(root, "speech2", seed=2),
        "noise": _make_shard_dir(root, "noise", seed=3, dur_range=(0.3, 1.0)),
        "rir": _make_shard_dir(root, "rir", seed=4, dur_range=(0.1, 0.3),
                               custom={"rir_onset": 10, "t60": 0.4}),
        "speech_codec": _make_shard_dir(root, "speech_codec", seed=5,
                                        extra_fields=("codec",)),
        "farend_echo": _make_shard_dir(root, "farend_echo", seed=6,
                                       extra_fields=("echo",),
                                       custom={"is_real": True}),
    }


def test_shard_source_reads_all(shards):
    src = ShardSource(shards["speech"])
    cuts = list(src.iter_cuts(seed=0))
    assert len(cuts) == 8
    assert all(c.audio.dtype == np.float32 for c in cuts)
    # shard-order shuffle is seed-deterministic
    ids_a = [c.id for c in src.iter_cuts(seed=5)]
    ids_b = [c.id for c in src.iter_cuts(seed=5)]
    assert ids_a == ids_b


def test_weighted_mux_and_cyclic_buffer(shards):
    mux = WeightedMux([ShardSource(shards["speech"], 1.0),
                       ShardSource(shards["speech2"], 3.0)])
    cuts = list(mux.iter_cuts(seed=0))
    assert len(cuts) == 16  # exhausts both
    buf = CyclicBuffer(mux, buffer_size=8)
    buf.reset(0)
    draws = [buf.draw().id for _ in range(40)]  # > total cuts: cycles forever
    assert len(set(draws)) > 4
    buf.release()
    assert buf.draw() is not None  # refills after release


def _hp(shards, segment=False):
    train = {
        "inputs": {
            "speech": [{"shard_dir": shards["speech"], "weight": 2.0},
                       {"shard_dir": shards["speech2"], "weight": 1.0}],
            "noise": [{"shard_dir": shards["noise"], "weight": 1.0}],
            "rir": [{"shard_dir": shards["rir"], "weight": 1.0}],
        },
        "num_buckets": 5, "max_utt_duration": 20.0, "min_utt_duration": 0.1,
        "prob_speech_reverb": 0.7, "prob_noise": 1.0, "aux_buffer_size": 16,
    }
    if segment:
        train["segment_size"] = SR
    return HParams(**{"sampling_rate": SR, "max_duration": 6.0,
                      "train": train})


def test_shard_dataset_batches(shards):
    ds = ShardDataset(_hp(shards), mode="train")
    ds.set_epoch(3)
    batches = list(ds)
    assert batches, "no batches assembled"
    total = sum(b.speech.shape[0] for b in batches)
    assert total == 16
    for b in batches:
        assert b.speech.shape == b.speech_clean.shape
        assert b.noise.shape == b.speech.shape
        assert b.rir.shape[2] == SR // 2
        # bucketing: batch duration near max_duration (except tails)
        assert b.num_samples.max() == b.speech.shape[-1]
    ds.release_auxiliary()


def test_shard_dataset_segment_mode(shards):
    ds = ShardDataset(_hp(shards, segment=True), mode="train", segment=True)
    ds.set_epoch(0)
    b = next(iter(ds))
    assert b.speech.shape[-1] == SR  # fixed segments, wrap-cropped


def test_segmental_rms_matches_reference_torch():
    torch = pytest.importorskip("torch")
    import types
    # the reference decorates kernels with @triton.jit unguarded; stub it
    if "triton" not in sys.modules:
        triton = types.ModuleType("triton")
        triton.jit = lambda fn=None, **kw: (fn if fn else (lambda f: f))
        triton.language = types.ModuleType("triton.language")
        triton.language.constexpr = int
        sys.modules["triton"] = triton
        sys.modules["triton.language"] = triton.language
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_segrms", "/root/reference/utils/segmental_rms.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((4, SR * 2)) * 0.05).astype(np.float32)
    wav[1] *= 0.0  # silent row -> +inf
    wav[2, :SR] *= 0.001  # half-quiet row
    ref = mod._segmental_rms_torch(torch.from_numpy(wav)).numpy()
    ours = np.asarray(segmental_rms(jnp.asarray(wav)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)
    # pallas form (interpreter on CPU backend) checked in test_ops_pallas


def test_dynamic_mixer_matches_reference_torch(shards):
    """Feed identical inputs + identical random draws to both mixers."""
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    mod = _load_ref_shard()
    spec = None
    rng = np.random.default_rng(0)
    b, t, t_rir = 3, SR, SR // 4
    speech = (rng.standard_normal((b, 1, t)) * 0.1).astype(np.float32)
    noise = (rng.standard_normal((b, 1, t)) * 0.05).astype(np.float32)
    rir = np.zeros((b, 1, t_rir), np.float32)
    rir[:, 0, 0] = 1.0
    rir[2, 0] = (rng.standard_normal(t_rir) * np.exp(
        -np.arange(t_rir) / 800)).astype(np.float32)
    onset = np.array([0, 0, 5], np.int64)
    t60 = np.array([1e-3, 1e-3, 0.4], np.float32)
    dbfs = np.array([-20.0, -25.0, -18.0], np.float32)
    snr = np.array([5.0, 10.0, 0.0], np.float32)

    ref_mixer = mod.DynamicMixer(rir_target_type="rts", t60_max=0.15,
                                 seg_abs_threshold=None)
    batch = mod.ShardBatch(
        speech=torch.from_numpy(speech),
        speech_clean=torch.from_numpy(speech.copy()),
        noise=torch.from_numpy(noise),
        rir=torch.from_numpy(rir),
        rir_onset=torch.from_numpy(onset),
        rir_t60=torch.from_numpy(t60))
    # monkeypatch torch's uniform draws to our fixed values
    orig_uniform = torch.Tensor.uniform_
    draws = iter([dbfs, snr])

    def fake_uniform(self, *a, **k):
        vals = next(draws)
        self.copy_(torch.from_numpy(vals[: self.numel()].astype(np.float32)))
        return self

    torch.Tensor.uniform_ = fake_uniform
    try:
        ref_out = ref_mixer(batch)
    finally:
        torch.Tensor.uniform_ = orig_uniform

    mixer = DynamicMixer(rir_target_type="rts", t60_max=0.15,
                         seg_abs_threshold=None)
    # bypass the PRNG: call internals with fixed draws by patching uniform
    orig_jax_uniform = jax.random.uniform
    jdraws = iter([jnp.asarray(dbfs), jnp.asarray(snr)])
    jax.random.uniform = lambda *a, **k: next(jdraws)
    try:
        out = mixer(jax.random.PRNGKey(0), jnp.asarray(speech),
                    jnp.asarray(speech.copy()), jnp.asarray(noise),
                    jnp.asarray(rir), jnp.asarray(onset), jnp.asarray(t60))
    finally:
        jax.random.uniform = orig_jax_uniform

    np.testing.assert_allclose(np.asarray(out["speech"]),
                               ref_out.speech.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["speech_clean"]),
                               ref_out.speech_clean.numpy(), atol=2e-4)


def test_rir_helpers_match_reference():
    pytest.importorskip("torch")
    import torch
    mod = _load_ref_shard()
    rng = np.random.default_rng(1)
    rir = rng.standard_normal((2, 1, 800)).astype(np.float32)
    onset = np.array([3, 40], np.int64)
    t60 = np.array([0.3, 0.1], np.float32)
    for ref_fn, our_fn, args in [
        (mod.get_early_rir, get_early_rir, {}),
        (mod.get_weighted_rir, get_weighted_rir, {}),
    ]:
        r = ref_fn(torch.from_numpy(rir), torch.from_numpy(onset)).numpy()
        o = np.asarray(our_fn(jnp.asarray(rir), jnp.asarray(onset)))
        np.testing.assert_allclose(o, r, atol=1e-6)
    r = mod.get_rts_rir(torch.from_numpy(rir), torch.from_numpy(onset),
                        torch.from_numpy(t60)).numpy()
    o = np.asarray(get_rts_rir(jnp.asarray(rir), jnp.asarray(onset),
                               jnp.asarray(t60)))
    np.testing.assert_allclose(o, r, atol=1e-5)
    # conv identity: unit impulse passes speech through
    speech = rng.standard_normal((2, 1, 1000)).astype(np.float32)
    imp = np.zeros((2, 1, 100), np.float32)
    imp[:, 0, 0] = 1.0
    y = np.asarray(batch_convolve_rir(jnp.asarray(speech), jnp.asarray(imp)))
    np.testing.assert_allclose(y, speech, atol=1e-4)


def test_segmental_rms_pallas_interpret():
    """Pallas kernel == XLA form (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu
    from fastenhancer_tpu.ops import segmental_rms_pallas

    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((3, SR)) * 0.05).astype(np.float32)
    wav[1] *= 0.0
    want = np.asarray(segmental_rms(jnp.asarray(wav)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(segmental_rms_pallas(jnp.asarray(wav)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ns_shard_training_smoke(shards, tmp_path):
    """Two steps of real shard training through the ns_shard wrapper.

    Runs in a SUBPROCESS: compiling this pjit train program (8 virtual
    devices + fused DynamicMixer) segfaults inside XLA:CPU
    backend_compile_and_load when the interpreter has already compiled the
    rest of the suite (reproducible at the same spot in 3 full-suite runs;
    passes in any fresh process). Isolation keeps the end-to-end coverage
    and sidesteps the in-process compiler crash."""
    import subprocess
    import textwrap
    import yaml

    cfg = yaml.safe_load(open("configs/fastenhancer_shard/t.yaml"))
    cfg["model_kwargs"].update({"channels": 8, "kernel_size": [4, 3]})
    cfg["model_kwargs"]["rnnformer_kwargs"].update(
        {"num_blocks": 1, "channels": 8, "freq": 8, "num_heads": 2})
    cfg["data"]["train"]["inputs"] = {
        "speech": [{"shard_dir": shards["speech_codec"], "weight": 1.0}],
        "noise": [{"shard_dir": shards["noise"], "weight": 1.0}],
        "rir": [{"shard_dir": shards["rir"], "weight": 1.0}],
        "farend_echo": [{"shard_dir": shards["farend_echo"], "weight": 1.0}],
    }
    cfg["data"]["train"]["prob_speech_codec"] = 0.5
    cfg["data"]["train"]["prob_farend_echo"] = 0.5
    cfg["data"]["train"]["prob_farend_only"] = 0.2
    cfg["data"]["train"]["aux_buffer_size"] = 16
    cfg["data"]["max_duration"] = 4.0
    cfg["train"]["steps_per_epoch"] = 2
    cfg["train"]["test"] = True
    cfg["train"]["losses"] = {"si_snr": {"weight": 1.0}}
    cfg.pop("pesq", None)
    # the shard recipe's valid set is a PAIRED NoiseSuppression dir, read
    # with val_keys=["clean","noisy"] not wrapper.keys (reference
    # train.py:87, wrappers/ns_shard.py:34)
    valid_dir = tmp_path / "valid"
    for kind in ("clean", "noisy"):
        (valid_dir / kind).mkdir(parents=True)
    rng = np.random.default_rng(7)
    from fastenhancer_tpu.data.audio_io import write_wav
    for i in range(2):
        c = (rng.standard_normal(SR) * 0.05).astype(np.float32)
        write_wav(str(valid_dir / "clean" / f"u{i}.wav"), c, SR)
        write_wav(str(valid_dir / "noisy" / f"u{i}.wav"),
                  c + (rng.standard_normal(SR) * 0.02).astype(np.float32), SR)
    cfg["data"]["valid"] = {"clean_dir": str(valid_dir / "clean"),
                            "noisy_dir": str(valid_dir / "noisy"),
                            "segment_size": None}
    cfg["valid"] = {"batch_size": 2, "num_workers": 0}
    cfg_path = tmp_path / "shard_smoke.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    driver = textwrap.dedent(f"""
        import sys, yaml, numpy as np
        sys.path.insert(0, "/root/repo")
        from fastenhancer_tpu.utils.hparams import HParams
        from fastenhancer_tpu.wrappers import get_wrapper
        from fastenhancer_tpu.data import get_dataset_dataloader
        hps = HParams(**yaml.safe_load(open({str(cfg_path)!r})))
        hps.base_dir = {str(tmp_path)!r}
        wrapper = get_wrapper("ns_shard")(hps, train=True)
        ds, loader = get_dataset_dataloader(hps, "train", wrapper.keys)
        ds.set_epoch(1)
        wrapper.epoch = 1
        wrapper.steps_per_epoch = 2
        summary = wrapper.train_epoch(loader)
        assert np.isfinite(summary["scalars"]["loss/si_snr"])
        # valid epoch through train.py's key selection (val_keys contract)
        _, valid_loader = get_dataset_dataloader(
            hps, "valid", getattr(wrapper, "val_keys", wrapper.keys))
        summary_v = wrapper.valid_epoch(valid_loader)
        assert np.isfinite(summary_v["scalars"]["loss/si_snr"])
        print("SHARD_SMOKE_OK", summary["scalars"]["loss/si_snr"])
    """)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    run = subprocess.run([sys.executable, "-c", driver], env=env,
                         capture_output=True, text=True, timeout=600,
                         cwd="/root/repo")
    assert run.returncode == 0, run.stderr[-3000:]
    assert "SHARD_SMOKE_OK" in run.stdout


def test_multifield_shard_source(shards):
    """Parallel-field tars (codec) are read in lockstep into Cut.extras."""
    src = ShardSource(shards["speech_codec"], fields=("recording", "codec"))
    cuts = list(src.iter_cuts(seed=0))
    assert len(cuts) == 8
    for c in cuts:
        np.testing.assert_allclose(c.extras["codec"], c.audio * 0.5,
                                   atol=2e-4)


def test_shard_dataset_codec_and_echo(shards):
    """prob_speech_codec=1: speech is the codec variant, speech_clean stays
    clean. prob_farend_echo=1: echo/farend share one wrap-crop cursor (so
    echo == FIELD_GAIN ratio * farend), is_real comes from cut custom, and
    noise is suppressed for real full-echo items (reference :841-892)."""
    hp = _hp(shards)
    hp.train["prob_speech_codec"] = 1.0
    hp.train["prob_speech_reverb"] = 0.0
    hp.train["prob_farend_echo"] = 1.0
    hp.train["inputs"]["speech"] = [
        {"shard_dir": shards["speech_codec"], "weight": 1.0}]
    hp.train["inputs"]["farend_echo"] = [
        {"shard_dir": shards["farend_echo"], "weight": 1.0}]
    ds = ShardDataset(hp, mode="train")
    ds.set_epoch(1)
    b = next(iter(ds))

    # codec: input speech = 0.5 * clean (minus 16-bit quantization)
    assert not np.allclose(b.speech, b.speech_clean)
    np.testing.assert_allclose(b.speech, b.speech_clean * 0.5, atol=2e-4)

    # echo aligned with farend via the shared cursor
    assert b.echo is not None and b.farend is not None
    live = np.abs(b.farend).max(axis=(1, 2)) > 0
    assert live.all()  # p=1: every item gets an echo
    np.testing.assert_allclose(b.echo, b.farend * FIELD_GAIN["echo"],
                               atol=4e-4)

    # is_real from shard custom; noise suppressed for real full-echo items
    assert b.is_real is not None and b.is_real.all()
    assert b.noise is None or np.abs(b.noise).max() == 0.0
    ds.release_auxiliary()


def test_dynamic_mixer_echo_matches_reference_torch(shards):
    """Echo (SER) mixing parity with pinned draws: dbFS, ser_real, ser, snr."""
    torch = pytest.importorskip("torch")
    mod = _load_ref_shard()
    rng = np.random.default_rng(1)
    b, t = 3, SR
    speech = (rng.standard_normal((b, 1, t)) * 0.1).astype(np.float32)
    echo = (rng.standard_normal((b, 1, t)) * 0.03).astype(np.float32)
    echo[1] = 0.0  # zero echo row must add nothing
    noise = (rng.standard_normal((b, 1, t)) * 0.05).astype(np.float32)
    is_real = np.array([True, False, False])
    dbfs = np.array([-20.0, -25.0, -18.0], np.float32)
    ser_r = np.array([3.0, 4.0, 5.0], np.float32)
    ser_s = np.array([-2.0, 8.0, 12.0], np.float32)
    snr = np.array([5.0, 10.0, 0.0], np.float32)

    ref_mixer = mod.DynamicMixer(seg_abs_threshold=None)
    batch = mod.ShardBatch(
        speech=torch.from_numpy(speech),
        speech_clean=torch.from_numpy(speech.copy()),
        echo=torch.from_numpy(echo),
        is_real=torch.from_numpy(is_real),
        noise=torch.from_numpy(noise))
    orig_uniform = torch.Tensor.uniform_
    draws = iter([dbfs, ser_r, ser_s, snr])

    def fake_uniform(self, *a, **k):
        vals = next(draws)
        self.copy_(torch.from_numpy(vals[: self.numel()].astype(np.float32)))
        return self

    torch.Tensor.uniform_ = fake_uniform
    try:
        ref_out = ref_mixer(batch)
    finally:
        torch.Tensor.uniform_ = orig_uniform

    mixer = DynamicMixer(seg_abs_threshold=None)
    orig_jax_uniform = jax.random.uniform
    jdraws = iter([jnp.asarray(dbfs), jnp.asarray(ser_r), jnp.asarray(ser_s),
                   jnp.asarray(snr)])
    jax.random.uniform = lambda *a, **k: next(jdraws)
    try:
        out = mixer(jax.random.PRNGKey(0), jnp.asarray(speech),
                    jnp.asarray(speech.copy()), jnp.asarray(noise),
                    echo=jnp.asarray(echo), is_real=jnp.asarray(is_real))
    finally:
        jax.random.uniform = orig_jax_uniform

    np.testing.assert_allclose(np.asarray(out["speech"]),
                               ref_out.speech.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["ser"]),
                               ref_out.ser.numpy(), atol=1e-6)


def test_shard_dataset_filter_padmode_text(shards):
    """ids_to_filter drops cuts; pad_mode=repeat wrap-pads short items to
    the batch length; text field comes from cut custom."""
    hp = _hp(shards)
    hp.train["ids_to_filter"] = ["speech-0-0", "speech2-0-1"]
    hp.train["pad_mode"] = "repeat"
    hp["text"] = "is_real"  # any custom key works for the plumbing test
    ds = ShardDataset(hp, mode="train")
    ds.set_epoch(3)
    batches = list(ds)
    ids = [i for b in batches for i in b.id_speech]
    assert "speech-0-0" not in ids and "speech2-0-1" not in ids
    assert sum(len(b.id_speech) for b in batches) == 14
    for b in batches:
        # repeat padding: every row fills the batch length
        live = np.abs(b.speech_clean[:, 0]) > 0
        assert (live.mean(axis=1) > 0.9).all()
        assert b.text is not None and len(b.text) == len(b.id_speech)
    ds.release_auxiliary()


def test_segment_mode_concat_with_silence(shards):
    """Segment items are multi-cut compositions separated by silence gaps
    (reference shard_segment.py _gen_speech), not single wrap-cropped cuts."""
    hp = _hp(shards, segment=True)
    hp.train["segment_size"] = 3 * SR  # longer than any fixture cut (<=2 s)
    hp.train["silence_length"] = 0.1
    hp.train["prob_speech_reverb"] = 0.0
    ds = ShardDataset(hp, mode="train", segment=True)
    ds.set_epoch(0)
    b = next(iter(ds))
    assert b.speech.shape[-1] == 3 * SR
    assert (b.num_samples == 3 * SR).all()
    for k, ids in enumerate(b.id_speech):
        assert "|" in ids  # every item composed from >1 cut
        # a silence gap exists: a run of exact zeros >= 0.05 s
        x = b.speech_clean[k, 0]
        zero = (x == 0).astype(np.int32)
        runs, best = 0, 0
        for z in zero:
            runs = runs + 1 if z else 0
            best = max(best, runs)
        assert best >= int(0.05 * SR), best
    ds.release_auxiliary()


def test_fast_tar_walker_matches_tarfile(shards):
    """The manual ustar walker yields exactly what the stdlib tarfile path
    yields (stems and bit-identical audio), with no duplicates."""
    import tarfile as tf
    tar_path = os.path.join(shards["speech"], "recording.000000.tar")
    fast = list(ShardSource._iter_tar_audio(tar_path))
    from fastenhancer_tpu.data.shard import _decode_audio
    with tf.open(tar_path) as tar:
        ref = [(os.path.basename(m.name).rsplit(".", 1)[0],
                _decode_audio(m.name, tar.extractfile(m).read()))
               for m in tar if m.isfile()]
    assert [s for s, _ in fast] == [s for s, _ in ref]
    for (_, a), (_, b) in zip(fast, ref):
        np.testing.assert_array_equal(a, b)


def test_shard_producer_propagates_errors(tmp_path):
    """A corrupt shard tar must raise in the training loop, not end the
    epoch silently."""
    d = tmp_path / "broken"
    d.mkdir()
    (d / "recording.000000.tar").write_bytes(b"not a tar at all" * 64)
    with gzip.open(d / "cuts.000000.jsonl.gz", "wt") as f:
        f.write(json.dumps({"id": "x", "duration": 1.0}) + "\n")
    hp = HParams(**{"sampling_rate": SR, "max_duration": 4.0, "train": {
        "inputs": {"speech": [{"shard_dir": str(d)}]},
        "num_buckets": 2, "max_utt_duration": 20.0,
        "min_utt_duration": 0.1, "prob_noise": 0.0}})
    ds = ShardDataset(hp, mode="train")
    ds.set_epoch(0)
    with pytest.raises(Exception):
        for _ in ds:
            pass


def test_segment_mode_defaults_to_48000(shards):
    """data.train without segment_size must behave like the reference's
    ShardSegment default of 48000 samples (reference
    utils/data/shard_segment.py:185,541) — the shard recipes rely on it."""
    hp = _hp(shards, segment=False)   # no segment_size key anywhere
    ds = ShardDataset(hp, mode="train", segment=True)
    assert ds.segment_size == 48_000
