"""External-model metrics: DNSMOS, SCOREQ, WER — gated wrappers.

The reference scores these through downloaded ONNX/HF models
(reference: scripts/metrics_ns.py:87-111, utils/scoreq_onnx.py). This
environment has neither the packages (torchmetrics[audio], onnxruntime,
whisper, jiwer) nor network egress to fetch the model weights, so each
scorer raises a clear ImportError explaining what to install; when the
dependencies ARE present the implementations below run the same pipelines
as the reference.
"""
from __future__ import annotations

import os
import typing as tp

import numpy as np

SCOREQ_CACHE = os.environ.get("SCOREQ_CACHE",
                              os.path.expanduser("~/.cache/scoreq"))
SCOREQ_URLS = {
    # reference: utils/scoreq_onnx.py:92-115 (Zenodo-hosted ONNX exports)
    "nr": "https://zenodo.org/records/13860326/files/scoreq_nr.onnx",
    "nmr": "https://zenodo.org/records/13860326/files/scoreq_nmr.onnx",
}


def make_dnsmos(sr: int = 16_000) -> tp.Callable[[np.ndarray],
                                                 tp.Dict[str, float]]:
    """One-time DNSMOS scorer construction (the reference builds the
    torchmetrics module once per run, scripts/metrics_ns.py:87-92)."""
    try:
        from torchmetrics.audio.dnsmos import DeepNoiseSuppressionMeanOpinionScore
    except ImportError as e:
        raise ImportError(
            "DNSMOS needs torchmetrics[audio] + onnxruntime (absent in this "
            "environment, and the ONNX models need network access)") from e
    import torch

    scorer = DeepNoiseSuppressionMeanOpinionScore(fs=sr, personalized=False)

    def score(wav: np.ndarray) -> tp.Dict[str, float]:
        p808, sig, bak, ovr = scorer(torch.from_numpy(np.asarray(wav)))
        return {"p808": float(p808), "sig": float(sig), "bak": float(bak),
                "ovrl": float(ovr)}

    return score


def dnsmos(wav: np.ndarray, sr: int = 16_000) -> tp.Dict[str, float]:
    """DNSMOS P.808 + P.835, one-shot form."""
    return make_dnsmos(sr)(wav)


class ScoreqONNX:
    """SCOREQ NR/NMR via onnxruntime (reference: utils/scoreq_onnx.py).

    Downloads the Zenodo ONNX exports into ~/.cache/scoreq on first use;
    wav2vec2 stride-320 padding applied like the reference (:17-25)."""

    def __init__(self, mode: str = "nmr"):
        try:
            import onnxruntime  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "SCOREQ needs onnxruntime (absent in this environment)") from e
        assert mode in ("nr", "nmr")
        self.mode = mode
        path = os.path.join(SCOREQ_CACHE, f"scoreq_{mode}.onnx")
        if not os.path.exists(path):
            os.makedirs(SCOREQ_CACHE, exist_ok=True)
            import urllib.request

            urllib.request.urlretrieve(SCOREQ_URLS[mode], path)
        import onnxruntime as ort

        self.sess = ort.InferenceSession(path)

    @staticmethod
    def _pad_stride(x: np.ndarray, stride: int = 320) -> np.ndarray:
        pad = (-len(x)) % stride
        return np.pad(x, (0, pad))

    def __call__(self, test: np.ndarray,
                 ref: tp.Optional[np.ndarray] = None) -> float:
        test = self._pad_stride(np.asarray(test, np.float32))[None]
        feeds = {"test": test}
        if self.mode == "nmr":
            assert ref is not None
            feeds["ref"] = self._pad_stride(np.asarray(ref, np.float32))[None]
        return float(self.sess.run(None, feeds)[0])


def make_wer() -> tp.Callable[[str, np.ndarray], float]:
    """One-time Whisper-turbo WER scorer construction (the reference loads
    the model once per run, scripts/metrics_ns.py:104-111)."""
    try:
        import whisper
        import jiwer
    except ImportError as e:
        raise ImportError(
            "WER needs openai-whisper + jiwer (absent in this environment; "
            "the whisper checkpoint also needs network access)") from e
    model = whisper.load_model("turbo")
    norm = jiwer.Compose([jiwer.ToLowerCase(), jiwer.RemovePunctuation(),
                          jiwer.RemoveMultipleSpaces(), jiwer.Strip()])

    def score(reference_text: str, wav: np.ndarray) -> float:
        hyp = model.transcribe(np.asarray(wav, np.float32))["text"]
        return float(jiwer.wer(norm(reference_text), norm(hyp)))

    return score


def wer(reference_text: str, wav: np.ndarray, sr: int = 16_000) -> float:
    """Whisper-turbo WER, one-shot form (reference:
    scripts/metrics_ns.py:104-111,156-165)."""
    return make_wer()(reference_text, wav)
