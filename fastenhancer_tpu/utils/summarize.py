"""TensorBoard summarization (reference: utils/summarize.py).

Writes scalars / audios / spectrogram images / histograms from the summary
dicts the wrappers produce. Uses tensorboardX (available in this image);
spectrograms are rendered with matplotlib like the reference (:44-66).
NaN/Inf values are filtered before histogram writes (:33-40).
"""
from __future__ import annotations

import typing as tp

import numpy as np


def plot_spectrogram_to_numpy(spec: np.ndarray) -> np.ndarray:
    """[F, T] log-magnitude -> HWC uint8 image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 3))
    im = ax.imshow(spec, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("frame")
    ax.set_ylabel("freq bin")
    fig.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


def summarize(
    writer,
    epoch: int,
    sampling_rate: int,
    scalars: tp.Optional[tp.Dict[str, float]] = None,
    hists: tp.Optional[tp.Dict[str, np.ndarray]] = None,
    audios: tp.Optional[tp.Dict[str, np.ndarray]] = None,
    specs: tp.Optional[tp.Dict[str, np.ndarray]] = None,
) -> None:
    for k, v in (scalars or {}).items():
        writer.add_scalar(k, v, epoch)
    for k, v in (hists or {}).items():
        v = np.asarray(v).ravel()
        v = v[np.isfinite(v)]
        if v.size:
            writer.add_histogram(k, v, epoch)
    for k, v in (audios or {}).items():
        v = np.asarray(v, np.float32).reshape(-1)
        peak = np.abs(v).max()
        if peak > 1.0:
            v = v / peak
        _add_audio(writer, k, v, epoch, sampling_rate)
    for k, v in (specs or {}).items():
        writer.add_image(k, plot_spectrogram_to_numpy(np.asarray(v)), epoch,
                         dataformats="HWC")


def _add_audio(writer, tag: str, wav: np.ndarray, step: int, sr: int) -> None:
    """tensorboardX add_audio encodes via soundfile (absent here); build the
    Summary proto from stdlib-encoded PCM16 wav bytes instead."""
    import io
    import wave as wave_mod

    from tensorboardX.proto.summary_pb2 import Summary

    buf = io.BytesIO()
    pcm = np.clip(wav * 32768.0, -32768, 32767).astype("<i2")
    with wave_mod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())
    audio = Summary.Audio(sample_rate=sr, num_channels=1,
                          length_frames=len(wav),
                          encoded_audio_string=buf.getvalue(),
                          content_type="audio/wav")
    writer._get_file_writer().add_summary(
        Summary(value=[Summary.Value(tag=tag, audio=audio)]), step)


def plot_param_and_grad(hists: tp.Dict[str, np.ndarray], params,
                        grads=None) -> None:
    """Flatten param (and grad) trees into histogram entries
    (reference: utils/summarize.py:16-41)."""
    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if leaf is None:
            continue
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        hists[f"param/{name}"] = np.asarray(leaf)
    if grads is not None:
        for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
            if leaf is None:
                continue
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path)
            hists[f"grad/{name}"] = np.asarray(leaf)
