"""Convergence validation: train the flagship on the synthetic separable
corpus and verify SNR climbs.

Trains bilstm-orig DaNet on the 'synth' narrowband-tones dataset (an ideal
mask exists for every mixture) for a few epochs using the real Trainer
loop, and reports first/last epoch train SNR.  This is the end-to-end
learning check that needs no TIMIT/WSJ0 data.

Run: python benchmarks/convergence.py [n_epochs]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(n_epoch: int = 5):
    import jax
    from danet_tpu.hparams import hparams
    import danet_tpu  # noqa: F401
    from danet_tpu.models import DaNet
    from danet_tpu.train.trainer import Trainer

    hparams.load_json(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "default.json"))
    hparams.ENCODER_TYPE = "bilstm-orig"
    hparams.DATASET_TYPE = "synth"
    hparams.BATCH_SIZE = 16
    hparams.COMPUTE_DTYPE = ("bfloat16"
                             if jax.default_backend() != "cpu" else "float32")
    hparams.LR = 1e-3
    hparams.ANCHOR_AUX_LOSS = 0.5  # train the inference (anchor) path too
    hparams.SUMMARY_DIR = "/tmp/danet-convergence"
    hparams.digest()

    dataset = hparams.get_dataset()()
    dataset.install_and_load()
    model = DaNet()
    trainer = Trainer(model, name="convergence", save_dir="/tmp/danet-conv")
    trainer.train(n_epoch, dataset, save_on_epoch=False,
                  valid_on_epoch=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
