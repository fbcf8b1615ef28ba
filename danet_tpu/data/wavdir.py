"""Plain-directory WAV dataset ('wav-dir'): real corpora with NO offline
preprocessing step.

The reference requires an offline pickle/HDF5 pipeline before any real
data can be trained on (/root/reference/app/datasets/TIMIT/process.py,
WSJ0/process.py and their install.sh drivers); this dataset instead
points ``WAVDIR_PATH`` at a folder of WAV files and computes the STFT on
the fly at epoch time (mono-mixdown, resampled to SMPRATE, same complex
[T, F] spectra contract as every other dataset — data/audio.py
load_wavfile).  A user with real WSJ0/LibriSpeech/etc. WAVs can train
immediately:

    python main.py -m train -ds wav-dir -c cfg.json   # WAVDIR_PATH in cfg

Layout: either ``<WAVDIR_PATH>/{train,valid,test}/*.wav`` subdirectories
(used verbatim; a missing valid/ aliases test/ and vice versa), or one
flat folder — utterances then split deterministically 8/1/1 by a
filename CRC (stable across runs, hosts and file orderings).  Speaker
mixing stays the trainer's consecutive-utterance pairing, exactly like
TIMIT/WSJ0 (reference main.py:414-421).

File lists are length-sorted (by on-disk size, a duration proxy) to
minimize batch padding — the same trick the reference bakes into its
offline TIMIT pipeline (TIMIT/process.py:141-151).  An in-process
spectra cache (``WAVDIR_CACHE_MB``, default 2048) makes epochs after the
first IO- and FFT-free, the same pattern as the synth corpora.
"""
from __future__ import annotations

import os
import zlib

import numpy as np

from danet_tpu.data.audio import load_wavfile, random_zeropad
from danet_tpu.data.dataset import Dataset
from danet_tpu.hparams import hparams


@hparams.register_dataset("wav-dir")
class WavDirDataset(Dataset):
    SUBSETS = ("train", "valid", "test")

    def __init__(self, path: str | None = None):
        super().__init__()
        self.path = path
        self._cache: dict = {}
        self._cache_bytes = 0

    # ------------------------------------------------------------------
    def _root(self) -> str:
        root = self.path or getattr(hparams, "WAVDIR_PATH", "") or ""
        if not root:
            raise IOError(
                "wav-dir dataset needs WAVDIR_PATH (a folder of WAVs, or "
                "one with train/valid/test subfolders) — set it in the "
                "config JSON or construct WavDirDataset(path=...)")
        if not os.path.isdir(root):
            raise IOError("WAVDIR_PATH %r is not a directory" % root)
        return root

    @staticmethod
    def _list_wavs(d: str):
        try:
            names = sorted(os.listdir(d))
        except OSError:
            return []
        return [os.path.join(d, n) for n in names
                if n.lower().endswith(".wav")]

    def install_and_load(self):
        root = self._root()
        self.files = {}
        sub_lists = {s: self._list_wavs(os.path.join(root, s))
                     for s in self.SUBSETS}
        if any(sub_lists.values()):
            self.files = sub_lists
            # tolerate missing eval splits: alias the other one, then
            # train.  A missing train/ split is NOT aliased — training on
            # the eval data silently would be wrong; fail loudly instead
            # of yielding zero-step "epochs".
            if not self.files["train"]:
                raise IOError(
                    "no .wav files under %s (the subfolder layout needs "
                    "a train/ split)" % os.path.join(root, "train"))
            for a, b in (("valid", "test"), ("test", "valid")):
                if not self.files[a]:
                    self.files[a] = self.files[b] or self.files["train"]
        else:
            # flat folder: deterministic 8/1/1 split by filename CRC
            # (process-independent — python hash() is salted)
            flat = self._list_wavs(root)
            if not flat:
                raise IOError("no .wav files under %r" % root)
            self.files = {s: [] for s in self.SUBSETS}
            for p in flat:
                h = zlib.crc32(os.path.basename(p).encode()) % 10
                s = "train" if h < 8 else ("valid" if h == 8 else "test")
                self.files[s].append(p)
            for a, b in (("valid", "test"), ("test", "valid")):
                if not self.files[a]:
                    self.files[a] = self.files[b] or self.files["train"]
        # eval-on-train aliasing must be LOUD (ADVICE r3): validation
        # running on the training files inflates valid metrics and defeats
        # keep-best / VALID_CRASH_FACTOR decisions keyed off the valid loss
        for s in ("valid", "test"):
            if self.files[s] is self.files["train"]:
                print("[WARNING] wav-dir %r split is empty and aliases the "
                      "TRAINING files — eval metrics will be optimistic; "
                      "add real %s data for trustworthy validation"
                      % (s, s))
        # length-sort (file size as the duration proxy) to minimize the
        # per-batch zero padding, as the reference's offline TIMIT
        # pipeline does (TIMIT/process.py:141-151)
        for s in self.SUBSETS:
            self.files[s] = sorted(
                self.files[s], key=lambda p: (os.path.getsize(p), p))
        self.is_loaded = True

    # ------------------------------------------------------------------
    def _spectra(self, path: str) -> np.ndarray:
        return self._cached(
            path, lambda: load_wavfile(path).astype(np.complex64))

    def _cached(self, key, make) -> np.ndarray:
        """Shared WAVDIR_CACHE_MB-budgeted loader cache (spectra + wave)."""
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        arr = make()
        cap = float(getattr(hparams, "WAVDIR_CACHE_MB", 2048) or 0)
        if self._cache_bytes + arr.nbytes <= cap * 1e6:
            self._cache[key] = arr
            self._cache_bytes += arr.nbytes
        return arr

    # waves carry the SAME scale whose STFT is this dataset's spectra
    # contract (load_wavfile STFTs raw NATIVE-scale samples, the
    # reference's convention, utils.py:95-122) — so wave-wire and
    # spectra-wire training are interchangeable on one checkpoint for
    # every source dtype (load_wav_raw normalize=False).  The int16
    # QUANTIZED wire additionally assumes 16-bit-origin material: its
    # declared scale below is the int16 bound, and _wave raises on
    # non-int16 sources when that wire is active (float WAVs at native
    # ~±1 would quantize at 1/32768 of the range; int32 would clip).
    WAVE_SCALE = 32768.0

    def _wave(self, path: str) -> np.ndarray:
        """Native-sample-scale resampled waveform (TRANSFER_DOMAIN='wave');
        cached in the same byte budget as the spectra (~4x smaller)."""
        from danet_tpu.data.audio import load_wav_raw

        def make():
            wav, dtype = load_wav_raw(path, hparams.SMPRATE,
                                      normalize=False, with_dtype=True)
            if (dtype != np.int16 and str(getattr(
                    hparams, "TRANSFER_DTYPE", "float32")) == "int16"):
                raise ValueError(
                    "TRANSFER_DTYPE='int16' wave wire: %r holds %s "
                    "samples — the symmetric 32768 PCM quantization is "
                    "only exact/well-scaled for 16-bit PCM sources. Use "
                    "TRANSFER_DTYPE='bfloat16'/'float32' or convert the "
                    "corpus to 16-bit WAVs." % (path, np.dtype(dtype).name))
            return wav

        return self._cached(("wave", path), make)

    def _epoch_impl(self, subset, batch_size, shuffle, load, pad_axis):
        if not self.is_loaded:
            raise RuntimeError("Dataset is not loaded.")
        if subset not in self.files:
            raise KeyError(
                'Unknown subset "%s", valid options are %s'
                % (subset, list(self.files.keys())))
        files = self.files[subset]
        tot = len(files)
        idx = np.random.permutation(tot) if shuffle else np.arange(tot)
        if 0 < tot < batch_size:
            # tiny subset (e.g. a handful of eval files): pad the index
            # list modulo the subset so one full batch still comes out —
            # the reference's WSJ0 loader does the same (wsj0.py:42-44)
            idx = np.resize(idx, batch_size)
            tot = batch_size

        def make_batch(sel):
            sigs = [load(files[j]) for j in sel]
            max_len = max(len(s) for s in sigs)
            batch = np.stack([
                random_zeropad(s, max_len - len(s), axis=pad_axis)
                for s in sigs])
            return (batch,)

        for i in range(0, tot - batch_size + 1, batch_size):
            yield make_batch(idx[i:i + batch_size])
        if tot >= batch_size and tot % batch_size:
            yield make_batch(idx[-batch_size:])

    def epoch(self, subset, batch_size, shuffle=False):
        yield from self._epoch_impl(
            subset, batch_size, shuffle, self._spectra, pad_axis=-2)

    def epoch_wave(self, subset, batch_size, shuffle=False):
        """Waveform epochs (TRANSFER_DOMAIN='wave'): [batch, S] float32,
        batch-padded with the random left/right zeropad augmentation on
        the sample axis; the STFT runs on-device in the jitted step."""
        yield from self._epoch_impl(
            subset, batch_size, shuffle, self._wave, pad_axis=-1)
