"""Data layer contract tests: toy/TIMIT/WSJ0 epoch semantics."""
import os
import pickle

import numpy as np
import pytest

from danet_tpu.data.dataset import WhiteNoiseData
from danet_tpu.data.timit import TimitDataset
from danet_tpu.data.wsj0 import Wsj0Dataset


def test_toy_dataset_contract(fresh_hparams):
    hp = fresh_hparams
    ds = WhiteNoiseData()
    with pytest.raises(RuntimeError):
        next(ds.epoch("train", 4))
    ds.install_and_load()
    batches = list(ds.epoch("train", 4))
    assert len(batches) == 10
    assert batches[0][0].shape == (4, 128, hp.FEATURE_SIZE)


def _write_timit_pickles(dirpath, n=10, feat=129):
    rng = np.random.RandomState(0)
    os.makedirs(dirpath, exist_ok=True)
    for subset in ["train", "test"]:
        sigs = [
            (rng.randn(rng.randint(20, 50), feat)
             + 1j * rng.randn(1, feat)).astype(np.complex64)
            for _ in range(n)]
        phonemes = [rng.randint(0, 60, size=(5,)).astype(np.int32)
                    for _ in range(n)]
        texts = [rng.randint(0, 27, size=(8,)).astype(np.int32)
                 for _ in range(n)]
        with open(os.path.join(dirpath, "%s_set.pkl" % subset), "wb") as f:
            pickle.dump(sigs, f, -1)
            pickle.dump(phonemes, f, -1)
            pickle.dump(texts, f, -1)


def test_timit_epoch(fresh_hparams, tmp_path):
    _write_timit_pickles(str(tmp_path))
    ds = TimitDataset(data_dir=str(tmp_path))
    ds.install_and_load()
    assert "valid" in ds.subset  # valid aliases test
    batches = list(ds.epoch("train", 4, shuffle=True))
    # 10 utterances, batch 4: 2 full batches + 1 remainder batch
    assert len(batches) == 3
    for sigs, (t_idx, t_val, t_shape) in batches:
        assert sigs.shape[0] == 4
        assert sigs.dtype == np.complex64
        # all batch members padded to equal length
        assert sigs.ndim == 3
        assert t_shape[0] == 4
    with pytest.raises(KeyError):
        next(ds.epoch("bogus", 4))


def test_timit_text_codec():
    s = "hello world"
    arr = TimitDataset.encode_from_str(s)
    assert TimitDataset.decode_to_str(arr) == s


def _write_wsj0_h5(path, sizes=(10, 6, 6), feat=129):
    import h5py
    rng = np.random.RandomState(0)
    names = ["train", "valid", "test"]
    lens = [rng.randint(20, 60, size=s) for s in sizes]
    total = sum(sizes)
    with h5py.File(path, "w") as f:
        dt = h5py.special_dtype(vlen=np.dtype("complex64"))
        feats = f.create_dataset("features", (total,), dtype=dt)
        shapes = f.create_dataset(
            "features_shapes", (total, 2), dtype="int32")
        row = 0
        for li in lens:
            for ln in li:
                feats[row] = (rng.randn(ln * feat)
                              + 1j * rng.randn(ln * feat)).astype(
                                  np.complex64)
                shapes[row] = (ln, feat)
                row += 1
        split_dt = np.dtype([
            ("split", "S8"), ("source", "S16"),
            ("start", "int64"), ("stop", "int64")])
        rows = []
        start = 0
        for name, s in zip(names, sizes):
            rows.append((name.encode(), b"features", start, start + s))
            start += s
        f.attrs["split"] = np.asarray(rows, dtype=split_dt)


def test_wsj0_epoch(fresh_hparams, tmp_path):
    h5py = pytest.importorskip("h5py")  # noqa: F841
    path = str(tmp_path / "wsj0-danet.hdf5")
    _write_wsj0_h5(path)
    ds = Wsj0Dataset(path=path)
    ds.install_and_load()
    batches = list(ds.epoch("train", 4, shuffle=False))
    # 10 examples, batch 4 -> padded to 12 (wraps modulo size): 3 batches
    assert len(batches) == 3
    for (sigs,) in batches:
        assert sigs.shape[0] == 4
        assert sigs.dtype == np.complex64
    # every batch is full even for non-divisible subsets
    vbatches = list(ds.epoch("valid", 4))
    assert all(b[0].shape[0] == 4 for b in vbatches)


def test_synth_dataset_learnable_structure(fresh_hparams):
    """Synthetic tone utterances are narrowband (separable by masking)."""
    from danet_tpu.data.synth import SyntheticTonesData
    hp = fresh_hparams
    ds = SyntheticTonesData()
    ds.install_and_load()
    (batch,) = next(iter(ds.epoch("train", 4)))
    assert batch.dtype == np.complex64
    assert batch.shape[0] == 4 and batch.shape[2] == hp.FEATURE_SIZE
    # each utterance concentrates energy in a narrow band: top bins hold
    # most of the power
    for u in range(4):
        pwr = np.abs(batch[u]).sum(axis=0)
        top = np.sort(pwr)[::-1]
        assert top[:20].sum() > 0.8 * pwr.sum()
    # deterministic by seed
    (batch2,) = next(iter(ds.epoch("train", 4)))
    np.testing.assert_array_equal(batch, batch2)
    # subsets draw from disjoint seed ranges
    (vbatch,) = next(iter(ds.epoch("valid", 4)))
    assert not np.array_equal(batch, vbatch)


def test_synth_speech_broadband_and_separable(fresh_hparams):
    """Formant-synthesis utterances are BROADBAND (BSS-eval identifiable,
    unlike the tone corpus) yet still separable by T-F masking: the ideal
    ratio mask recovers each source at healthy SNR."""
    from danet_tpu.data.synth_speech import SyntheticSpeechData
    hp = fresh_hparams
    ds = SyntheticSpeechData()
    ds.install_and_load()
    (batch,) = next(iter(ds.epoch("train", 4)))
    assert batch.dtype == np.complex64
    assert batch.shape[0] == 4 and batch.shape[2] == hp.FEATURE_SIZE

    # broadband: a large fraction of bins carry meaningful energy
    e = (np.abs(batch) ** 2).mean(axis=(0, 1))
    assert (e > 0.01 * e.max()).mean() > 0.5

    # ideal-ratio-mask separability on a 2-speaker mixture
    a, b = batch[0], batch[1]
    mix = a + b
    for src in (a, b):
        mask = np.abs(src) / (np.abs(a) + np.abs(b) + 1e-9)
        est = mask * mix
        err = np.sum(np.abs(src - est) ** 2)
        snr = 10 * np.log10(np.sum(np.abs(src) ** 2) / (err + 1e-12))
        assert snr > 5.0, snr

    # deterministic by seed; subsets disjoint
    (batch2,) = next(iter(ds.epoch("train", 4)))
    np.testing.assert_array_equal(batch, batch2)
    (vbatch,) = next(iter(ds.epoch("valid", 4)))
    assert not np.array_equal(batch, vbatch)


def test_timit_exact_multiple_keeps_all_batches(fresh_hparams, tmp_path):
    """Regression: tot % batch_size == 0 must yield tot/batch_size batches
    (the reference drops the last full batch, timit.py:46)."""
    _write_timit_pickles(str(tmp_path), n=12)
    ds = TimitDataset(data_dir=str(tmp_path))
    ds.install_and_load()
    assert len(list(ds.epoch("train", 4))) == 3
    assert len(list(ds.epoch("train", 12))) == 1
    assert len(list(ds.epoch("train", 5))) == 3  # 2 full + 1 tail


def test_synth_epoch_cache_identical_and_hit(fresh_hparams):
    """Cached epochs replay byte-identical batches without regenerating."""
    from danet_tpu.data.synth import SyntheticTonesData
    fresh_hparams.SYNTH_BATCHES = 3
    fresh_hparams.digest()
    ds = SyntheticTonesData()
    ds.install_and_load()
    first = [b[0].copy() for b in ds.epoch("train", 4)]
    calls = {"n": 0}
    orig = ds._make_batch

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    ds._make_batch = counting
    second = [b[0] for b in ds.epoch("train", 4)]
    assert calls["n"] == 0  # fully served from cache
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)
    # different subset is a different cache key (held-out stays held-out)
    valid = [b[0] for b in ds.epoch("valid", 4)]
    assert calls["n"] == 3
    assert not np.array_equal(valid[0], first[0])


def test_wsj0_fetch_preserves_requested_order(fresh_hparams, tmp_path):
    """Shuffled batch order must survive the HDF5 fetch — a sorted fetch
    would bias speaker pairing toward adjacent (same-speaker) rows."""
    from danet_tpu.data.wsj0 import Wsj0Dataset
    path = str(tmp_path / "w.h5")
    _write_wsj0_h5(path)
    ds = Wsj0Dataset(path=path)
    ds.install_and_load()
    import h5py
    with h5py.File(path, "r") as f:
        want_lens = [int(f["features_shapes"][r][0]) for r in (7, 1, 4, 2)]
    got = ds._fetch("train", np.asarray([7, 1, 4, 2]))
    assert [len(x) for x in got] == want_lens
