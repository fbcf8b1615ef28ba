"""Synthetic separable dataset: narrowband multi-tone "speakers".

Not present in the reference (whose only built-in data is unlearnable white
noise, dataset.py:43-63).  Each utterance is a sum of a few amplitude-
modulated sinusoids drawn from a random narrow frequency band, so mixtures
of two utterances are separable by time-frequency masking — an ideal mask
exists and training demonstrably converges.  Used for convergence smoke
tests and benchmarks without TIMIT/WSJ0 corpora.

Follows the standard Dataset contract (epoch -> complex spectra batches).
"""
from __future__ import annotations

import numpy as np

from danet_tpu.data.dataset import Dataset
from danet_tpu.hparams import hparams


@hparams.register_dataset("synth")
class SyntheticTonesData(Dataset):
    """Deterministic-seed synthetic tone corpus, STFT'd on the fly."""

    DURATION_S = 1.5
    N_TONES = 3
    # int16-wave-wire amplitude bound: utterances are a /N_TONES-scaled
    # sum of N_TONES unit-envelope sines, so |x| <= 1 by construction
    WAVE_SCALE = 1.0

    @property
    def N_BATCHES(self):
        v = getattr(hparams, "SYNTH_BATCHES", None)
        return 20 if v is None else int(v)

    # epochs are deterministic (seeded per batch index, not per epoch), so
    # regenerating + re-STFT-ing every epoch is pure host-side waste — the
    # device step is ~6 ms while corpus regeneration dominated epoch wall
    # time.  Cache the generated batches per (subset, shape-config) key,
    # up to this many bytes total (beyond it, fall back to regeneration).
    CACHE_BYTES_MAX = 4 << 30

    def __init__(self, seed: int = 0):
        super().__init__()
        self.seed = seed
        self._cache = {}
        self._cache_bytes = 0

    def install_and_load(self):
        self.is_loaded = True

    def _utterance(self, rng: np.random.RandomState) -> np.ndarray:
        sr = hparams.SMPRATE
        n = int(self.DURATION_S * sr)
        t = np.arange(n) / sr
        # random narrow band per "speaker": tones cluster within ~600 Hz
        lo = rng.uniform(200.0, sr / 2 - 900.0)
        wav = np.zeros(n, dtype=np.float64)
        for _ in range(self.N_TONES):
            freq = rng.uniform(lo, lo + 600.0)
            phase = rng.uniform(0, 2 * np.pi)
            # slow random AM envelope
            env_f = rng.uniform(0.5, 3.0)
            env = 0.55 + 0.45 * np.sin(
                2 * np.pi * env_f * t + rng.uniform(0, 2 * np.pi))
            wav += env * np.sin(2 * np.pi * freq * t + phase)
        return (wav / self.N_TONES).astype(np.float32)

    def _rng_for(self, subset: str, b: int) -> np.random.RandomState:
        base = {"train": 0, "valid": 10 ** 6, "test": 2 * 10 ** 6}[subset]
        return np.random.RandomState(self.seed + base + b)

    def _make_batch(self, subset: str, batch_size: int,
                    b: int) -> np.ndarray:
        from danet_tpu.data.audio import stft_np
        rng = self._rng_for(subset, b)
        return np.stack([
            stft_np(self._utterance(rng)).astype(hparams.COMPLEXX)
            for _ in range(batch_size)])

    def _make_batch_wave(self, subset: str, batch_size: int,
                         b: int) -> np.ndarray:
        # SAME RNG stream as _make_batch: batch b's waveforms are exactly
        # the signals the spectra epoch STFTs (stft_np consumes nothing
        # from rng), so wave-wire and spectra-wire training see identical
        # utterances — the basis of the wave/spectra parity tests
        rng = self._rng_for(subset, b)
        return np.stack([self._utterance(rng)
                         for _ in range(batch_size)])

    def _cached_batches(self, key, n_batches: int, make):
        cached = self._cache.get(key)
        for b in range(n_batches):
            if cached is not None and b < len(cached):
                batch = cached[b]
            else:
                batch = make(b)
                if self._cache_bytes + batch.nbytes <= self.CACHE_BYTES_MAX:
                    if cached is None:
                        cached = self._cache[key] = []
                    if b == len(cached):
                        cached.append(batch)
                        self._cache_bytes += batch.nbytes
            yield (batch,)

    def epoch(self, subset, batch_size, shuffle=False):
        if not self.is_loaded:
            raise RuntimeError("Dataset is not loaded.")
        # FFT_WND folds in: the window shapes the cached spectra, so an
        # in-process window change must not serve stale batches
        key = (subset, batch_size, self.N_BATCHES, hparams.FFT_SIZE,
               hparams.FFT_STRIDE, hparams.SMPRATE, hparams.COMPLEXX,
               getattr(hparams, "FFT_WND", "sqrt-hann"))
        yield from self._cached_batches(
            key, self.N_BATCHES,
            lambda b: self._make_batch(subset, batch_size, b))

    def epoch_wave(self, subset, batch_size, shuffle=False):
        """Waveform epochs for TRANSFER_DOMAIN='wave': [batch, S] float32
        utterances; the STFT runs on-device inside the jitted step
        (ops/dsp.py GEMM STFT).  4-8x fewer host->device wire bytes than
        the spectra contract — the front-end moves onto the chip instead
        of shipping its (redundant, f32-wide) output over the link."""
        if not self.is_loaded:
            raise RuntimeError("Dataset is not loaded.")
        key = ("wave", subset, batch_size, self.N_BATCHES, hparams.SMPRATE)
        yield from self._cached_batches(
            key, self.N_BATCHES,
            lambda b: self._make_batch_wave(subset, batch_size, b))
