"""Dataset / dataloader factory (reference: utils/data/__init__.py:21-93).

Mode-keyed dataset selection with per-mode batch-size/worker overrides.
`data.dataset` may be one name or a {mode: name} map.
"""
from __future__ import annotations

import typing as tp

from .audio_io import read_wav, write_wav, wav_duration, resample
from .loader import DataLoader, collate
from .noise_suppression import NSDataset


def get_dataset_dataloader(
    hps,
    mode: str,
    keys: tp.List[str],
    textprocessor=None,
    n_devices: int = 1,
    rank: tp.Optional[int] = None,
) -> tp.Tuple[tp.Any, DataLoader]:
    # Multihost: each process loads its own slice of the global batch
    # (DistributedSampler(shuffle=False) semantics, reference
    # utils/data/__init__.py:79-81). Single host: world=1, a no-op.
    import jax

    world = jax.process_count()
    if rank is None:
        rank = jax.process_index()
    if mode == "infer":
        # showcase inference runs on rank 0 over ALL files (reference
        # builds the infer loader on rank 0 only, train.py:84-95)
        world, rank = 1, 0
    dataset_name = hps["data"]["dataset"]
    if not isinstance(dataset_name, str):
        dataset_name = dataset_name[mode]

    if dataset_name == "NoiseSuppression":
        cls = NSDataset
    elif dataset_name == "NoiseSuppressionOnTheFly":
        from .ns_on_the_fly import NSOnTheFlyDataset

        cls = NSOnTheFlyDataset
    elif dataset_name in ("ShardOnTheFly", "ShardSegment"):
        from .shard import build_shard_dataloader

        return build_shard_dataloader(hps, mode=mode, keys=keys,
                                      segment=(dataset_name == "ShardSegment"),
                                      rank=rank)
    else:
        raise ValueError(f"unknown dataset: {dataset_name}")

    hp = hps["train"]
    batch_size = getattr(hp, "batch_size", 1)
    num_workers = getattr(hp, "num_workers", 2)
    drop_last = getattr(hp, "drop_last", False)
    pad_multiple = 1
    if mode == "valid":
        sec = getattr(hps, "valid", {})
        batch_size = getattr(sec, "batch_size", batch_size)
        num_workers = getattr(sec, "num_workers", num_workers)
        drop_last = getattr(sec, "drop_last", drop_last)
    elif mode == "infer":
        sec = getattr(hps, "infer", {})
        batch_size = getattr(sec, "batch_size", 1)
        num_workers = getattr(sec, "num_workers", 0)
        # same 16 x hop bucketing as pesq mode: infer_epoch then compiles a
        # bounded program set instead of one per unique file length
        pad_multiple = 16 * getattr(hps["model_kwargs"], "hop_size", 256)
    elif mode == "pesq":
        sec = getattr(hps, "pesq", {})
        batch_size = getattr(sec, "batch_size", batch_size)
        num_workers = getattr(sec, "num_workers", num_workers)
        # length-sorted unsegmented eval: bucket pad to bound XLA compiles
        pad_multiple = 16 * getattr(hps["model_kwargs"], "hop_size", 256)
    elif mode != "train":
        raise ValueError(f"unknown dataset mode: {mode}")

    dataset = cls(hps["data"], keys, textprocessor=textprocessor, mode=mode,
                  batch_size=batch_size * n_devices)
    loader = DataLoader(dataset, batch_size=batch_size,
                        num_workers=max(num_workers, 1),
                        drop_last=drop_last, pad_multiple=pad_multiple,
                        process_stride=(rank, world))
    return dataset, loader


__all__ = [
    "get_dataset_dataloader", "NSDataset", "DataLoader", "collate",
    "read_wav", "write_wav", "wav_duration", "resample",
]
