"""Dataset ABC + toy white-noise dataset.

Same contract as the reference data layer
(/root/reference/app/datasets/dataset.py): ``epoch(subset, batch_size,
shuffle)`` is a host-side generator yielding tuples whose first element is a
[batch, T, F] spectra array (complex or real), and ``install_and_load()``
prepares local data.  The toy dataset is the built-in fake backend for
debugging and CI smoke tests (reference dataset.py:43-63, README.md:25).
"""
from __future__ import annotations

import numpy as np

from danet_tpu.hparams import hparams


class Dataset:
    def __init__(self):
        self.is_loaded = False

    def epoch(self, subset: str, batch_size: int, shuffle: bool = False):
        """Yields (signals, ...) tuples; signals is [batch, T, F]."""
        raise NotImplementedError()

    def install_and_load(self):
        raise NotImplementedError()


@hparams.register_dataset("toy")
class WhiteNoiseData(Dataset):
    """Uniform white-noise spectra: 10 batches of [batch, 128, FEATURE_SIZE]
    per epoch (reference dataset.py:43-63)."""

    def epoch(self, subset, batch_size, shuffle=False):
        if not self.is_loaded:
            raise RuntimeError("Dataset is not loaded.")
        for _ in range(10):
            signal = np.random.rand(
                batch_size, 128, hparams.FEATURE_SIZE).astype(hparams.FLOATX)
            yield (signal,)

    def install_and_load(self):
        self.is_loaded = True
