"""Worker process for the two-process multi-host training test.

Spawned by tests/test_parallel.py::test_multihost_two_process_training:
each of 2 processes exposes 4 virtual CPU devices, joins the
jax.distributed cluster over gloo, and runs real Trainer epochs on the toy
dataset — exercising multihost.initialize, host_batch_slice,
global_batch_from_local and the crc32-seeded shared epoch streams
(SURVEY.md §2.4 elasticity row; the reference is single-process,
/root/reference/main.py:584 "TODO manage device").

Usage: multihost_worker.py <pid> <nprocs> <port> <outdir>
Writes {outdir}/result_<pid>.json with the final loss and a parameter
checksum; the parent asserts both processes converge to identical state.
"""
import json
import os
import sys


def main():
    pid, nprocs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from danet_tpu.parallel import multihost
    assert multihost.initialize("localhost:" + port, nprocs, pid)
    assert jax.process_count() == nprocs
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nprocs

    from danet_tpu.hparams import hparams
    import danet_tpu  # noqa: F401  (registries)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hparams.load_json(os.path.join(repo, "default.json"))
    hparams.BATCH_SIZE = 8
    hparams.MAX_TRAIN_LEN = 32
    hparams.TIME_BUCKET = 32
    hparams.SUMMARY_DIR = os.path.join(outdir, "logs%d" % pid)
    hparams.digest()

    # per-host slice arithmetic on the global batch
    rows = multihost.host_batch_slice(hparams.BATCH_SIZE)
    per = hparams.BATCH_SIZE // nprocs
    assert rows == slice(pid * per, (pid + 1) * per), rows

    from danet_tpu.data.dataset import WhiteNoiseData
    from danet_tpu.models import DaNet
    from danet_tpu.train.trainer import Trainer

    ds = WhiteNoiseData()
    ds.install_and_load()
    trainer = Trainer(DaNet(), name="mh")
    state = trainer.train(2, ds, save_on_epoch=False, valid_on_epoch=False)

    # global scalars: replicated outputs fetch identically on every host
    import jax.numpy as jnp
    checksum = float(jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x).astype(jnp.float64))
                      for x in jax.tree_util.tree_leaves(p)))(
        state["params"]))
    lr = trainer.get_learn_rate(state)
    with open(os.path.join(outdir, "result_%d.json" % pid), "w") as f:
        json.dump({"pid": pid, "epoch": state["epoch"],
                   "step": state["step"], "checksum": checksum,
                   "lr": lr}, f)


if __name__ == "__main__":
    main()
