"""Unit tests for the multihost batch-shape reconciliation (no OS processes).

The 2-process end-to-end run lives in tests/test_multihost.py; these tests
drive `_reconcile_multihost` and the wrapper multihost branches directly by
faking `jax.process_count()` / `process_allgather`, covering the advisor
round-3 findings:
  * the shard / on-the-fly train paths must reconcile cross-host shapes
    (ragged rows, per-host bucket lengths, natural-length rir) instead of
    calling shard_batch on mismatched local blocks;
  * fixed-segment training (static_shapes) must not allgather per step;
  * local_rows must not duplicate rows when the batch axis is replicated
    across a second mesh axis.
"""
import types

import jax
import numpy as np
import pytest

from fastenhancer_tpu.wrappers.ns import ModelWrapper as NSWrapper
from fastenhancer_tpu.wrappers.ns_shard import ModelWrapper as ShardWrapper
from fastenhancer_tpu.wrappers.ns_on_the_fly import (
    ModelWrapper as OnTheFlyWrapper,
)

HOP = 256


def bare(cls, n_devices=4, hop=HOP):
    w = cls.__new__(cls)
    w.n_devices = n_devices
    w.hop_size = hop
    w._mh_dims_cache = {}
    w.mesh = None
    return w


class FakeGather:
    """Simulates a 2-process world: the peer reports `peer_fn(local_sig)`."""

    def __init__(self, monkeypatch, peer_fn):
        self.calls = 0
        self.peer_fn = peer_fn
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        from jax.experimental import multihost_utils

        def fake_allgather(x):
            self.calls += 1
            local = np.asarray(x)
            return np.stack([local, np.asarray(self.peer_fn(local))])

        monkeypatch.setattr(multihost_utils, "process_allgather",
                            fake_allgather)


def test_reconcile_pads_shared_crops_to_hop_and_pads_rir(monkeypatch):
    # peer has more rows (3 -> pad to 4 local-device multiple of max) and a
    # longer shared time (1000 -> hop-floored 1024? no: floor(1100/256)*256)
    def peer(local):
        peer_sig = local.copy()
        peer_sig[1] = 3      # rows
        peer_sig[2] = 1100   # shared t
        peer_sig[3] = 900    # rir natural length
        return peer_sig

    g = FakeGather(monkeypatch, peer)
    w = bare(NSWrapper, n_devices=8)  # world 2 -> 4 local devices
    arrs = {
        "clean": np.ones((2, 1000), np.float32),
        "noise": np.ones((2, 990), np.float32),
        "rir": np.ones((2, 1, 800), np.float32),
        "row_mask": np.ones(2, np.float32),
    }
    out = w._reconcile_multihost(arrs, shared_time_keys=("clean", "noise"))
    assert g.calls == 1
    # shared t = floor(max(990, 1100)/256)*256 = 1024 -> local pads up
    assert out["clean"].shape == (4, 1024)
    assert out["noise"].shape == (4, 1024)
    # rir pads (never crops) to the cross-host natural max
    assert out["rir"].shape == (4, 1, 900)
    assert np.all(out["rir"][:2, :, :800] == 1.0)
    assert np.all(out["rir"][:, :, 800:] == 0.0)
    # padded rows are masked
    np.testing.assert_array_equal(out["row_mask"], [1, 1, 0, 0])
    # real samples preserved, padding zero
    assert np.all(out["clean"][:2, :1000] == 1.0)
    assert np.all(out["clean"][2:] == 0.0)
    assert np.all(out["noise"][:2, 990:] == 0.0)


def test_reconcile_crops_shared_time_to_cross_host_max(monkeypatch):
    # peer's max t is SMALLER than ours -> we crop to the hop floor of the
    # cross-host max (= ours), peer pads; never below either host's floor
    def peer(local):
        s = local.copy()
        s[2] = 700
        return s

    FakeGather(monkeypatch, peer)
    w = bare(NSWrapper, n_devices=2)
    arrs = {"clean": np.ones((1, 1030), np.float32),
            "row_mask": np.ones(1, np.float32)}
    out = w._reconcile_multihost(arrs, shared_time_keys=("clean",))
    assert out["clean"].shape == (1, 1024)  # floor(1030/256)*256


def test_reconcile_static_caches_the_allgather(monkeypatch):
    g = FakeGather(monkeypatch, lambda s: s)
    w = bare(NSWrapper, n_devices=2)
    arrs = {"clean": np.ones((2, 512), np.float32),
            "row_mask": np.ones(2, np.float32)}
    w._reconcile_multihost(arrs, ("clean",), static_shapes=True)
    w._reconcile_multihost(arrs, ("clean",), static_shapes=True)
    w._reconcile_multihost(arrs, ("clean",), static_shapes=True)
    assert g.calls == 1  # one sync total, not per step

    # a changed signature under the static promise must raise BEFORE any
    # collective (a deadlock otherwise: peers would skip the allgather)
    bad = {"clean": np.ones((3, 512), np.float32),
           "row_mask": np.ones(3, np.float32)}
    with pytest.raises(RuntimeError, match="static_shapes"):
        w._reconcile_multihost(bad, ("clean",), static_shapes=True)
    assert g.calls == 1


def test_reconcile_keyset_divergence_raises(monkeypatch):
    # peer runs a different config (different key fingerprint)
    def peer(local):
        s = local.copy()
        s[0] = s[0] + 1
        return s

    FakeGather(monkeypatch, peer)
    w = bare(NSWrapper, n_devices=2)
    arrs = {"clean": np.ones((1, 512), np.float32),
            "row_mask": np.ones(1, np.float32)}
    with pytest.raises(RuntimeError, match="key sets differ"):
        w._reconcile_multihost(arrs, ("clean",))


def _patch_shard_batch(monkeypatch, module):
    """Make the post-reconcile device placement a host no-op so the wrapper
    branch logic can run in one process."""
    monkeypatch.setattr(module, "shard_batch", lambda batch, mesh: batch)


def test_shard_wrapper_multihost_branch_reconciles(monkeypatch):
    """ns_shard._mix_to_device under process_count>1 must agree on global
    shapes (advisor r3 medium): peer has a bigger bucket and a longer rir."""
    import fastenhancer_tpu.wrappers.ns_shard as ns_shard_mod

    def peer(local):
        s = local.copy()
        s[1] = 3        # rows
        s[2] = 2100     # shared t (speech/speech_clean/noise)
        s[3] = 1500     # rir
        return s

    g = FakeGather(monkeypatch, peer)
    _patch_shard_batch(monkeypatch, ns_shard_mod)
    w = bare(ShardWrapper, n_devices=2)  # 1 local device
    w._mix_key = jax.random.PRNGKey(0)

    seen = {}

    def mixer(sub, speech, speech_clean, noise, rir, rir_onset, rir_t60,
              echo=None, is_real=None):
        seen.update(speech=speech, speech_clean=speech_clean, noise=noise,
                    rir=rir)
        return {"speech": speech, "speech_clean": speech_clean}

    w.mixer = mixer
    b = types.SimpleNamespace(
        speech=np.ones((2, 1, 2000), np.float32),
        speech_clean=np.ones((2, 1, 2000), np.float32),
        noise=np.ones((2, 1, 2000), np.float32),
        rir=np.ones((2, 1, 1200), np.float32),
        rir_onset=np.zeros(2, np.int32),
        rir_t60=np.ones(2, np.float32),
        echo=None, is_real=None)
    out, real_b = w._mix_to_device(b)
    assert g.calls == 1
    assert real_b == 2
    t_c = (2100 // HOP) * HOP  # 2048
    assert seen["speech"].shape == (3, 1, t_c)
    assert seen["rir"].shape == (3, 1, 1500)      # padded, not cropped
    assert out["noisy"].shape == (3, t_c)
    np.testing.assert_array_equal(np.asarray(out["row_mask"]), [1, 1, 0])


def test_on_the_fly_wrapper_multihost_branch_reconciles(monkeypatch):
    import fastenhancer_tpu.parallel as par_mod

    def peer(local):
        s = local.copy()
        s[1] = 4  # peer still has a full batch; we have the ragged tail
        return s

    g = FakeGather(monkeypatch, peer)
    _patch_shard_batch(monkeypatch, par_mod)
    w = bare(OnTheFlyWrapper, n_devices=2)

    class FakeSNRMixer:
        def sample_params(self):
            return 5.0, 0.1

        def __call__(self, clean, noise, snr, rms, rir=None):
            return clean, noise, clean + noise

    w.snr_mixer = FakeSNRMixer()
    w.dynamic_lpf = types.SimpleNamespace(p_lpf=0.0)
    batch = {"clean": np.ones((3, 2048), np.float32),
             "noise": np.ones((3, 2048), np.float32)}
    out, real_b = w._device_batch(batch, ("clean", "noisy"))
    assert g.calls == 1
    assert real_b == 3
    assert np.asarray(out["noisy"]).shape == (4, 2048)
    np.testing.assert_array_equal(np.asarray(out["row_mask"]), [1, 1, 1, 0])


def test_local_rows_dedupes_replicated_batch_axis(monkeypatch):
    """A 2-D mesh replicating the batch dim must not duplicate rows
    (advisor r3 low, parallel/__init__.py local_rows)."""
    from fastenhancer_tpu.parallel import local_rows

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    rows = np.arange(8, dtype=np.float32).reshape(4, 2)

    class Shard:
        def __init__(self, start, stop):
            self.index = (slice(start, stop), slice(None))
            self.data = rows[start:stop]

    # batch axis split in two, each block replicated twice (second axis)
    arr = types.SimpleNamespace(addressable_shards=[
        Shard(0, 2), Shard(2, 4), Shard(0, 2), Shard(2, 4)])
    np.testing.assert_array_equal(local_rows(arr), rows)
