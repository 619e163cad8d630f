"""Worker for tests/test_multihost_cli.py: one rank of an N-process
jax.distributed run that executes the REAL CLI (cl4wsis_tpu.cli.main.main)
end-to-end — sharded Loader -> jitted step on the global mesh -> rank-0
checkpoint -> resume -> sharded eval merge (the reference's N-process DDP
launch, run.py:38-77, as one SPMD program per host).

argv: coordinator nprocs rank local_devices data_root workdir out_json
"""

import json
import os
import sys


def main():
    (coordinator, nprocs, rank, local_devices,
     data_root, workdir, out_json) = sys.argv[1:8]
    nprocs, rank, local_devices = int(nprocs), int(rank), int(local_devices)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nprocs, process_id=rank)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == local_devices * nprocs

    # record every epoch's returned metrics without altering behavior
    from cl4wsis_tpu.train import trainer as trainer_mod
    losses = []
    orig = trainer_mod.Trainer.train_epoch

    def wrapped(self, epoch, batches, logger=None):
        m = orig(self, epoch, batches, logger)
        losses.append([epoch, float(m["loss"])])
        return m

    trainer_mod.Trainer.train_epoch = wrapped

    from cl4wsis_tpu.cli.main import main as cli_main

    ckpt = os.path.join(workdir, "ck")
    common = ["--data_root", data_root, "--dataset", "voc",
              "--task", "15-5", "--step", "0", "--name", "mh",
              "--tiny", "true", "--batch_size", "4", "--crop_size", "32",
              "--crop_size_val", "32", "--checkpoint", ckpt,
              "--dtype", "float32", "--bce", "true", "--optim", "adam",
              "--lr", "5e-5", "--kernel", "15", "--val_kernel", "15",
              "--pretrained", "false", "--num_workers", "1",
              "--logdir", os.path.join(workdir, "logs")]

    rc1 = cli_main(common + ["--epochs", "2"])
    n_after_run1 = len(losses)
    # resume continuity: epoch count raised to 3, --continue_ckpt picks up
    # the epoch-1 checkpoint and trains exactly epoch 2
    rc2 = cli_main(common + ["--epochs", "3", "--continue_ckpt", "true"])

    ckpt_dir = os.path.join(ckpt, "step", "voc-15-5-ov", "mh_0")
    with open(out_json, "w") as f:
        json.dump({"rc1": rc1, "rc2": rc2, "rank": rank,
                   "losses": losses, "n_run1": n_after_run1,
                   "ckpt_exists": os.path.exists(ckpt_dir)}, f)
    print(f"[worker {rank}] done", flush=True)


if __name__ == "__main__":
    main()
