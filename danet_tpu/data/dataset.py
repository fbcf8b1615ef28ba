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

    # ------------------------------------------------------------------
    # shared helper for spectra-backed corpora (TIMIT pickles, WSJ0 HDF5)
    # to serve the wave wire (TRANSFER_DOMAIN='wave') without changing
    # their on-disk artifacts: invert each utterance's stored STFT back
    # to samples host-side (exact — audio.spectra_to_wave) and cache the
    # result so epochs after the first are FFT-free.
    WAVE_CACHE_BYTES_MAX = 2 << 30

    def _wave_from_spectra(self, key, spectra: np.ndarray) -> np.ndarray:
        from danet_tpu.data.audio import spectra_to_wave
        cache = getattr(self, "_wave_cache", None)
        if cache is None:
            cache = self._wave_cache = {}
            self._wave_cache_bytes = 0
        # FFT params fold into the key: an in-process hparams change must
        # not serve waveforms inverted under the old framing
        full_key = (key, hparams.FFT_SIZE, hparams.FFT_STRIDE)
        hit = cache.get(full_key)
        if hit is not None:
            return hit
        wav = spectra_to_wave(np.asarray(spectra))
        if self._wave_cache_bytes + wav.nbytes <= self.WAVE_CACHE_BYTES_MAX:
            cache[full_key] = wav
            self._wave_cache_bytes += wav.nbytes
        return wav


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
