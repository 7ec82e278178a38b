"""Mocked-backend tests for the gated external metrics (DNSMOS/SCOREQ/WER).

The real backends (torchmetrics[audio], onnxruntime, whisper, jiwer) and
their model weights are not available in this environment (reference gates
them the same way). These tests stub the backend modules and assert the
glue each wrapper is responsible for: feed construction, the wav2vec2
stride-320 padding contract (reference: utils/scoreq_onnx.py:17-25), text
normalization order, and the clear-ImportError gating.
"""
import sys
import types

import numpy as np
import pytest

import fastenhancer_tpu.metrics.external as ext


@pytest.fixture
def clean_modules():
    """Remove stubbed modules after each test."""
    added = []
    yield added
    for name in added:
        sys.modules.pop(name, None)


# ---------------------------------------------------------------------------
# gating
# ---------------------------------------------------------------------------

def test_gated_importerrors_name_the_missing_dep():
    with pytest.raises(ImportError, match="torchmetrics"):
        ext.dnsmos(np.zeros(16000, np.float32))
    with pytest.raises(ImportError, match="onnxruntime"):
        ext.ScoreqONNX("nmr")
    with pytest.raises(ImportError, match="whisper"):
        ext.wer("hello world", np.zeros(16000, np.float32))


# ---------------------------------------------------------------------------
# DNSMOS
# ---------------------------------------------------------------------------

def test_dnsmos_glue(clean_modules, monkeypatch):
    calls = {}

    class FakeScorer:
        def __init__(self, fs, personalized):
            calls["init"] = (fs, personalized)

        def __call__(self, wav):
            calls["wav"] = np.asarray(wav)
            import torch

            return torch.tensor([3.5, 3.3, 4.0, 3.1])

    mod = types.ModuleType("torchmetrics.audio.dnsmos")
    mod.DeepNoiseSuppressionMeanOpinionScore = FakeScorer
    pkg = types.ModuleType("torchmetrics")
    audio = types.ModuleType("torchmetrics.audio")
    for name, m in (("torchmetrics", pkg), ("torchmetrics.audio", audio),
                    ("torchmetrics.audio.dnsmos", mod)):
        sys.modules[name] = m
        clean_modules.append(name)

    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    out = ext.dnsmos(wav, sr=16000)
    # P.808 + P.835 sig/bak/ovrl mapping (reference: scripts/metrics_ns.py:87-92)
    expect = {"p808": 3.5, "sig": 3.3, "bak": 4.0, "ovrl": 3.1}
    assert set(out) == set(expect)
    for k in expect:
        assert out[k] == pytest.approx(expect[k], abs=1e-6), k
    assert calls["init"] == (16000, False)
    np.testing.assert_allclose(calls["wav"], wav)


# ---------------------------------------------------------------------------
# SCOREQ
# ---------------------------------------------------------------------------

def _fake_ort(calls):
    ort = types.ModuleType("onnxruntime")

    class FakeSession:
        def __init__(self, path):
            calls["path"] = path

        def run(self, outs, feeds):
            calls["feeds"] = feeds
            return [np.float32(0.42)]

    ort.InferenceSession = FakeSession
    return ort


def test_scoreq_nmr_pads_to_stride_320(clean_modules, monkeypatch, tmp_path):
    calls = {}
    sys.modules["onnxruntime"] = _fake_ort(calls)
    clean_modules.append("onnxruntime")
    monkeypatch.setattr(ext, "SCOREQ_CACHE", str(tmp_path))
    (tmp_path / "scoreq_nmr.onnx").write_bytes(b"fake")  # skip download

    scorer = ext.ScoreqONNX("nmr")
    assert calls["path"].endswith("scoreq_nmr.onnx")
    test = np.ones(16000 - 7, np.float32)
    ref = np.ones(16000 - 131, np.float32)
    val = scorer(test, ref)
    assert val == pytest.approx(0.42)
    # wav2vec2 stride-320 zero-padding, batch dim added
    for key, src in (("test", test), ("ref", ref)):
        fed = calls["feeds"][key]
        assert fed.shape[0] == 1
        assert fed.shape[1] % 320 == 0
        assert fed.shape[1] - len(src) < 320
        np.testing.assert_allclose(fed[0, : len(src)], src)
        assert (fed[0, len(src):] == 0).all()


def test_scoreq_nr_needs_no_ref(clean_modules, monkeypatch, tmp_path):
    calls = {}
    sys.modules["onnxruntime"] = _fake_ort(calls)
    clean_modules.append("onnxruntime")
    monkeypatch.setattr(ext, "SCOREQ_CACHE", str(tmp_path))
    (tmp_path / "scoreq_nr.onnx").write_bytes(b"fake")

    scorer = ext.ScoreqONNX("nr")
    scorer(np.ones(320, np.float32))
    assert set(calls["feeds"]) == {"test"}
    # nmr mode without a reference must fail loudly
    (tmp_path / "scoreq_nmr.onnx").write_bytes(b"fake")
    with pytest.raises(AssertionError):
        ext.ScoreqONNX("nmr")(np.ones(320, np.float32))


# ---------------------------------------------------------------------------
# WER
# ---------------------------------------------------------------------------

def test_wer_glue(clean_modules):
    whisper = types.ModuleType("whisper")

    class FakeModel:
        def transcribe(self, wav):
            assert wav.dtype == np.float32
            return {"text": "  Hello, WORLD! "}

    whisper.load_model = lambda name: FakeModel()

    jiwer = types.ModuleType("jiwer")
    jiwer.ToLowerCase = lambda: str.lower
    jiwer.RemovePunctuation = lambda: (
        lambda s: "".join(c for c in s if c.isalnum() or c.isspace()))
    jiwer.RemoveMultipleSpaces = lambda: (lambda s: " ".join(s.split()))
    jiwer.Strip = lambda: str.strip

    def compose(fns):
        def run(s):
            for f in fns:
                s = f(s)
            return s
        return run

    jiwer.Compose = compose

    def wer_fn(ref, hyp):
        r, h = ref.split(), hyp.split()
        return sum(a != b for a, b in zip(r, h)) / max(len(r), 1)

    jiwer.wer = wer_fn
    for name, m in (("whisper", whisper), ("jiwer", jiwer)):
        sys.modules[name] = m
        clean_modules.append(name)

    # normalization makes "Hello, WORLD!" == "hello world" -> WER 0
    out = ext.wer("hello world", np.zeros(16000, np.float32))
    assert out == 0.0
    out = ext.wer("goodbye world", np.zeros(16000, np.float32))
    assert out == pytest.approx(0.5)
