"""Device-mesh / sharding utilities — the TPU-native distributed runtime.

The reference's distributed layer is NCCL data-parallelism: DDP grad
allreduce, SyncBatchNorm, and scalar loss reductions (reference: train.py:
65-71, wrappers/ns.py:79-82, losses.py:223). On TPU all of that collapses
into *sharding annotations*: the train step is jitted over a 1-D "dp" mesh
with the batch axis sharded and the model state replicated; XLA inserts the
grad psum (≡ DDP allreduce) and the global batch-stat means (≡ SyncBN) over
ICI automatically.

Multi-host (DCN) extension would add `jax.distributed.initialize()` and a 2-D
mesh; out of scope for parity with the single-node reference.
"""
from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "dp"


def make_mesh(
    n_devices: tp.Optional[int] = None,
    devices: tp.Optional[tp.Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the dp mesh axis."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: tp.Any, mesh: Mesh) -> tp.Any:
    """Place every array in the batch pytree with its batch axis sharded.

    Single process: `batch` is the global batch, device_put splits it over
    local devices. Multi process: `batch` is this process's LOCAL rows (the
    loader serves a disjoint stride per process) and the global array is
    assembled row-block per process — process p owns global rows
    [p*local : (p+1)*local]. Local row counts must match across processes
    (the wrapper pads to a common count first)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: tp.Any, mesh: Mesh) -> tp.Any:
    """Replicate a (process-identical) pytree over the mesh. Multi-process:
    leaves are host-fetched first — device_put accepts numpy inputs for
    cross-process shardings, treating the value as identical on every
    process (true here: same seed => same init; same checkpoint)."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        tree = jax.tree.map(np.asarray, tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def local_rows(arr: tp.Any) -> np.ndarray:
    """Host-fetch this process's contiguous row block of a batch-sharded
    global array (the inverse of shard_batch's multi-process assembly).
    Single process: the whole array."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    # dedupe by row range: if the batch axis is replicated across a second
    # mesh axis, multiple addressable shards cover the same rows — keep one
    # per distinct row start instead of concatenating duplicates
    by_start: tp.Dict[int, np.ndarray] = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in by_start:
            by_start[start] = np.asarray(s.data)
    return np.concatenate([by_start[k] for k in sorted(by_start)])


def shard_map_stream(fn: tp.Callable, mesh: Mesh,
                     n_replicated: int = 1) -> tp.Callable:
    """Run `fn(*replicated_args, batch_array)` once per device on the local
    batch shard (batch = leading axis over the dp mesh axis).

    This is the multi-chip serving path for Pallas kernels: a `pallas_call`
    does not auto-partition under sharding annotations (XLA would fall back
    or fail), but under shard_map the kernel simply executes per shard —
    streaming inference is batch-parallel with no collectives, so fused ==
    sharded-fused == unsharded math (tested on a virtual 8-device mesh).
    """
    from jax.experimental.shard_map import shard_map

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(),) * n_replicated + (P(BATCH_AXIS),),
        out_specs=P(BATCH_AXIS), check_rep=False)


def pad_batch_to(batch: tp.Any, multiple: int) -> tp.Tuple[tp.Any, int]:
    """Pad the leading axis of every array up to a multiple (for even
    sharding); returns (padded_batch, original_batch_size)."""
    sizes = {x.shape[0] for x in jax.tree.leaves(batch)}
    assert len(sizes) == 1, f"inconsistent batch sizes: {sizes}"
    b = sizes.pop()
    pad = (-b) % multiple
    if pad == 0:
        return batch, b
    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths)
    return jax.tree.map(_pad, batch), b
