"""Training entry point.

Same CLI contract as the reference (reference: train.py:26-34):

    python train.py -n NAME -c configs/fastenhancer/t.yaml [-p a.b=v ...] [-f]

but one process drives every local TPU chip through a single pjit'd train
step (the reference's mp.spawn/NCCL launcher collapses into jax sharding;
reference: train.py:44-78). Resume: re-run with the same -n.
"""
import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Honor an explicit JAX_PLATFORMS even when a site hook pre-registered a
# different backend (this container's sitecustomize forces "axon,cpu").
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-n", "--name", required=True,
                   help="run name == logs/{name} directory")
    p.add_argument("-c", "--config", default=None,
                   help="yaml/json config (omit to resume from the run dir)")
    p.add_argument("-p", "--params", nargs="*", default=[],
                   help="dot-path overrides a.b.c=value")
    p.add_argument("-f", "--force_save", action="store_true",
                   help="overwrite an existing saved config")
    p.add_argument("--base_dir", default="logs")
    # multi-host analog of the reference's torchrun launcher
    # (reference: train_torchrun.py): every host runs the same command with
    # its own --process_id; jax.distributed wires the DCN mesh.
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 for multi-host training")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    base_dir = os.path.join(args.base_dir, args.name)

    from fastenhancer_tpu.utils.hparams import get_hparams
    from fastenhancer_tpu.utils.summarize import summarize
    from fastenhancer_tpu.wrappers import get_wrapper
    from fastenhancer_tpu.data import get_dataset_dataloader

    import jax

    if args.coordinator:
        # multi-host analog of the reference's torchrun launcher
        # (reference train_torchrun.py:23-46); must run before get_hparams
        # so only rank 0 writes the run-dir config (the reference's rank-0
        # config save, train_torchrun.py:47)
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)
    # rank-0-only logging/checkpointing, like the reference's verbose gate +
    # rank-0 save (reference train.py:60-166, utils/verbose.py:4-7)
    is_main = jax.process_index() == 0

    hps = get_hparams(args.config, base_dir, save=is_main,
                      params=args.params, force_save=args.force_save)

    seed = getattr(hps.train, "seed", 1)
    random.seed(seed)
    np.random.seed(seed)
    print(f"devices: {jax.devices()}")
    wrapper = get_wrapper(hps.wrapper)(hps, train=True)
    wrapper.load()  # resume if a checkpoint exists

    n_dev = wrapper.n_devices
    train_dataset, train_loader = get_dataset_dataloader(
        hps, "train", wrapper.keys, n_devices=n_dev)
    _, valid_loader = get_dataset_dataloader(
        hps, "valid", getattr(wrapper, "val_keys", wrapper.keys),
        n_devices=n_dev)
    _, infer_loader = get_dataset_dataloader(
        hps, "infer", wrapper.infer_keys, n_devices=n_dev)

    writer_train = writer_valid = None
    if is_main:
        from tensorboardX import SummaryWriter

        writer_train = SummaryWriter(os.path.join(base_dir, "train"))
        writer_valid = SummaryWriter(os.path.join(base_dir, "valid"))

    save_interval = getattr(hps.train, "save_interval", 20)
    infer_interval = getattr(hps.infer, "interval", 20) if "infer" in hps else 0
    pesq_interval = wrapper.pesq_interval
    max_epochs = hps.train.max_epochs
    sr = hps.data.sampling_rate

    for epoch in range(wrapper.epoch + 1, max_epochs + 1):
        wrapper.epoch = epoch
        t0 = time.time()
        if hasattr(train_dataset, "shuffle"):
            train_dataset.shuffle(seed + epoch)

        summary = wrapper.train_epoch(train_loader)
        # free shard aux audio buffers between epochs
        # (reference: train.py:129-130)
        if hasattr(train_dataset, "release_auxiliary"):
            train_dataset.release_auxiliary()
        summary["scalars"]["lr"] = wrapper.get_lr()
        if is_main:
            summarize(writer_train, epoch, sr, **summary)

        calc_metrics = pesq_interval and epoch % pesq_interval == 0
        summary_v = wrapper.valid_epoch(valid_loader,
                                        calculate_metrics=calc_metrics)
        if is_main:
            summarize(writer_valid, epoch, sr, **summary_v)

        if infer_interval and epoch % infer_interval == 0 and is_main:
            # rank-0-only showcase inference (reference: train.py:136-143
            # builds and drives the infer loader on rank 0 alone)
            summary_i = wrapper.infer_epoch(infer_loader)
            summarize(writer_valid, epoch, sr, **summary_i)

        if is_main and (epoch % save_interval == 0 or epoch == max_epochs
                        or wrapper.test):
            wrapper.save(epoch)

        msg = "  ".join(f"{k.split('/')[-1]} {v:.4f}"
                        for k, v in summary_v["scalars"].items())
        extra = wrapper.metrics.print() if (wrapper.metrics and calc_metrics) else ""
        if is_main:
            print(f"Epoch {epoch}/{max_epochs}  valid: {msg}{extra}"
                  f"  [{time.time() - t0:.1f}s]")

        if wrapper.test:
            break

    if is_main:
        writer_train.close()
        writer_valid.close()


if __name__ == "__main__":
    main()
