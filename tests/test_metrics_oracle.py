"""Oracles for the home-grown numerics: STOI/ESTOI, PESQ loss, resample.

STOI/ESTOI (`fastenhancer_tpu/metrics/stoi.py`) are implemented from the
papers because pystoi is absent here (reference consumes pystoi:
utils/measure_metrics.py:151-157). This file pins them two ways:
  1. an independently written oracle implementation below (different code
     structure: stride-tricks framing, einsum segment correlation, vectorized
     normalization) — agreement catches transcription bugs in constants,
     band edges, and normalization order;
  2. property tests that hold for the published algorithms: identity ~= 1,
     scale invariance, monotonicity over an SNR grid, near-zero score for
     uncorrelated noise.

PESQ loss (`fastenhancer_tpu/pesq_loss.py`) is pinned here by severity
rank tests across THREE degradation families (additive noise, low-pass
filtering, clipping) — the property a training regularizer must have.
Its rank agreement against the native ITU-T P.862 metric itself is
asserted separately in tests/test_pesq_native.py.
"""
import numpy as np
import pytest

from fastenhancer_tpu.metrics.stoi import stoi, estoi
from fastenhancer_tpu.data.audio_io import resample

SR = 16000


# ---------------------------------------------------------------------------
# Independent STOI/ESTOI oracle (vectorized; same published constants)
# ---------------------------------------------------------------------------

def _oracle_frames(x, framelen=256, hop=128):
    n = (len(x) - framelen) // hop + 1
    shape = (n, framelen)
    strides = (x.strides[0] * hop, x.strides[0])
    f = np.lib.stride_tricks.as_strided(x, shape, strides).copy()
    return f * np.hanning(framelen + 2)[1:-1]


def _oracle_obm(fs=10000, nfft=512, num_bands=15, min_freq=150.0):
    f = np.arange(nfft // 2 + 1) * fs / nfft
    k = np.arange(num_bands, dtype=float)
    lo = min_freq * 2.0 ** ((2 * k - 1) / 6)
    hi = min_freq * 2.0 ** ((2 * k + 1) / 6)
    obm = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        obm[i, np.square(f - lo[i]).argmin(): np.square(f - hi[i]).argmin()] = 1
    return obm


def _oracle_stoi(x, y, sr, extended):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if sr != 10000:
        x = resample(x, sr, 10000).astype(np.float64)
        y = resample(y, sr, 10000).astype(np.float64)
    # silence removal
    xf, yf = _oracle_frames(x), _oracle_frames(y)
    e = 20 * np.log10(np.linalg.norm(xf, axis=1) + np.finfo(float).eps)
    keep = e > e.max() - 40.0
    xf, yf = xf[keep], yf[keep]
    xs = np.zeros((len(xf) - 1) * 128 + 256)
    ys = np.zeros_like(xs)
    for i in range(len(xf)):
        xs[i * 128: i * 128 + 256] += xf[i]
        ys[i * 128: i * 128 + 256] += yf[i]
    obm = _oracle_obm()
    X = np.sqrt(obm @ np.abs(np.fft.rfft(_oracle_frames(xs), 512, axis=1).T) ** 2)
    Y = np.sqrt(obm @ np.abs(np.fft.rfft(_oracle_frames(ys), 512, axis=1).T) ** 2)
    N = 30
    nseg = X.shape[1] - N + 1
    # [S, J, N] overlapping segments
    Xs = np.stack([X[:, m: m + N] for m in range(nseg)])
    Ys = np.stack([Y[:, m: m + N] for m in range(nseg)])
    eps = np.finfo(float).eps
    if not extended:
        alpha = (np.linalg.norm(Xs, axis=2, keepdims=True)
                 / (np.linalg.norm(Ys, axis=2, keepdims=True) + eps))
        Yp = np.minimum(Ys * alpha, Xs * (1 + 10 ** (15.0 / 20.0)))
        xn = Xs - Xs.mean(2, keepdims=True)
        yn = Yp - Yp.mean(2, keepdims=True)
        r = np.einsum("sjn,sjn->sj", xn, yn) / (
            np.linalg.norm(xn, axis=2) * np.linalg.norm(yn, axis=2) + eps)
        return float(r.mean())
    def nrm(a, ax):
        a = a - a.mean(ax, keepdims=True)
        return a / (np.linalg.norm(a, axis=ax, keepdims=True) + eps)
    Xn, Yn = nrm(nrm(Xs, 2), 1), nrm(nrm(Ys, 2), 1)
    return float(np.einsum("sjn,sjn->s", Xn, Yn).mean() / N)


# ---------------------------------------------------------------------------
# Fixtures: speech-like test signals
# ---------------------------------------------------------------------------

def _speechlike(seconds=3.0, seed=0):
    """Syllabically modulated speech-shaped noise + harmonics with a pause —
    broadband (covers all 15 third-octave bands) so STOI behaves as on real
    speech; exercises silence removal, band envelopes, and segment
    correlation. Measured anchors: ~0.84 STOI at 0 dB SNR, ~0.998 at 20 dB
    — the published operating range."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    w = np.fft.rfft(rng.standard_normal(n))
    f = np.fft.rfftfreq(n, 1 / SR)
    sn = np.fft.irfft(w / np.maximum(f, 100.0) ** 0.5, n)  # -3 dB/oct tilt
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t)
    harm = sum(a * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6))
               for h, a in ((1, 1.0), (2, 0.6), (3, 0.4), (4, 0.25)))
    sig = 0.6 * harm / np.abs(harm).max() + 1.2 * sn / np.abs(sn).max()
    sig *= np.clip(np.sin(2 * np.pi * 3.5 * t) + 0.6, 0, None)  # syllabic
    sig[int(0.9 * SR): int(1.1 * SR)] = 0  # pause for silence removal
    sig = sig + 0.001 * rng.standard_normal(n)
    return (0.2 * sig / np.abs(sig).max()).astype(np.float64)


def _noisy(clean, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(len(clean))
    noise *= np.linalg.norm(clean) / np.linalg.norm(noise) * 10 ** (-snr_db / 20)
    return clean + noise


# ---------------------------------------------------------------------------
# STOI/ESTOI tests
# ---------------------------------------------------------------------------

def test_stoi_matches_independent_oracle():
    clean = _speechlike()
    for snr in (0.0, 10.0):
        deg = _noisy(clean, snr)
        ours = stoi(clean, deg, SR)
        ref = _oracle_stoi(clean, deg, SR, extended=False)
        assert abs(ours - ref) < 1e-10, (snr, ours, ref)


def test_estoi_matches_independent_oracle():
    clean = _speechlike()
    for snr in (0.0, 10.0):
        deg = _noisy(clean, snr)
        ours = estoi(clean, deg, SR)
        ref = _oracle_stoi(clean, deg, SR, extended=True)
        assert abs(ours - ref) < 1e-10, (snr, ours, ref)


def test_stoi_identity_is_one():
    clean = _speechlike()
    assert stoi(clean, clean.copy(), SR) == pytest.approx(1.0, abs=1e-6)
    assert estoi(clean, clean.copy(), SR) == pytest.approx(1.0, abs=1e-6)


def test_stoi_scale_invariant():
    """The alpha normalization makes STOI invariant to a static gain on the
    degraded signal (paper sec. II-C)."""
    clean = _speechlike()
    deg = _noisy(clean, 5.0)
    a = stoi(clean, deg, SR)
    b = stoi(clean, 7.3 * deg, SR)
    assert abs(a - b) < 1e-9


def test_stoi_monotone_in_snr():
    clean = _speechlike()
    grid = [-10.0, -5.0, 0.0, 5.0, 10.0, 20.0]
    s = [stoi(clean, _noisy(clean, q), SR) for q in grid]
    e = [estoi(clean, _noisy(clean, q), SR) for q in grid]
    assert all(b > a for a, b in zip(s, s[1:])), s
    assert all(b > a for a, b in zip(e, e[1:])), e
    # clean-end anchors: high intelligibility at 20 dB, poor at -10 dB
    assert s[-1] > 0.99 and s[0] < 0.6, s
    assert e[-1] > 0.95 and e[0] < 0.25, e


def test_stoi_uncorrelated_noise_scores_low():
    clean = _speechlike()
    rng = np.random.default_rng(9)
    noise = 0.1 * rng.standard_normal(len(clean))
    assert stoi(clean, noise, SR) < 0.3
    assert estoi(clean, noise, SR) < 0.05


# ---------------------------------------------------------------------------
# PESQ loss: rank correlation with degradation severity
# ---------------------------------------------------------------------------

def _spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum()
                 / (np.linalg.norm(ra) * np.linalg.norm(rb)))


@pytest.fixture(scope="module")
def pesq_loss():
    import jax
    from fastenhancer_tpu.pesq_loss import PESQLoss

    fn = PESQLoss(sample_rate=SR)
    return jax.jit(lambda r, d: fn(r, d))


def _lowpass(x, cutoff_hz):
    from scipy.signal import butter, lfilter

    b, a = butter(6, cutoff_hz / (SR / 2))
    return lfilter(b, a, x)


def test_pesq_loss_ranks_noise_severity(pesq_loss):
    import jax.numpy as jnp

    clean = _speechlike(seconds=2.0)[None].astype(np.float32)
    snrs = [0.0, 5.0, 10.0, 20.0, 30.0]
    losses = [float(pesq_loss(jnp.asarray(clean),
                              jnp.asarray(_noisy(clean[0], q)[None]
                                          .astype(np.float32))))
              for q in snrs]
    # severity = -snr; loss must rank perfectly with severity
    assert _spearman(losses, [-q for q in snrs]) >= 0.999, losses


def test_pesq_loss_ranks_bandwidth_loss(pesq_loss):
    import jax.numpy as jnp

    clean = _speechlike(seconds=2.0)[None].astype(np.float32)
    cutoffs = [500.0, 1000.0, 2000.0, 4000.0]
    losses = [float(pesq_loss(jnp.asarray(clean),
                              jnp.asarray(_lowpass(clean[0], c)[None]
                                          .astype(np.float32))))
              for c in cutoffs]
    assert _spearman(losses, [-c for c in cutoffs]) >= 0.999, losses


def test_pesq_loss_ranks_clipping(pesq_loss):
    import jax.numpy as jnp

    clean = _speechlike(seconds=2.0)[None].astype(np.float32)
    peak = np.abs(clean).max()
    levels = [0.9, 0.5, 0.25, 0.1]  # clip threshold as fraction of peak
    losses = [float(pesq_loss(jnp.asarray(clean),
                              jnp.asarray(np.clip(clean, -peak * l, peak * l))))
              for l in levels]
    assert _spearman(losses, [-l for l in levels]) >= 0.999, losses


def test_pesq_loss_identity_near_zero(pesq_loss):
    import jax.numpy as jnp

    clean = jnp.asarray(_speechlike(seconds=2.0)[None].astype(np.float32))
    ident = float(pesq_loss(clean, clean))
    deg = float(pesq_loss(clean, jnp.asarray(
        _noisy(np.asarray(clean)[0], 5.0)[None].astype(np.float32))))
    assert ident < 0.1 * deg, (ident, deg)


# ---------------------------------------------------------------------------
# Resample
# ---------------------------------------------------------------------------

def test_resample_preserves_tones():
    """Polyphase resampling must preserve in-band tones (freq + amplitude)
    across the rates the metrics stack uses (16k->10k for STOI, 48k->16k)."""
    for sr_in, sr_out in ((16000, 10000), (48000, 16000), (44100, 16000)):
        t = np.arange(sr_in) / sr_in
        x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        y = resample(x, sr_in, sr_out)
        assert abs(len(y) - sr_out) <= 1
        spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
        f_peak = spec.argmax() * sr_out / len(y)
        assert abs(f_peak - 440.0) < 2.0, (sr_in, sr_out, f_peak)
        mid = y[len(y) // 4: -len(y) // 4]
        assert abs(np.abs(mid).max() - 0.5) < 0.01
