"""Offline WSJ0 preprocessing: NIST SPHERE -> STFT spectra HDF5.

Equivalent of the reference pipeline
(/root/reference/app/datasets/WSJ0/process.py): reads the si_tr_s /
si_dt_05 / si_et_05 file lists produced by install.sh, decodes each SPHERE
file (via the bundled native C++ decoder in danet_tpu/native — the
reference shells out to the external sph2pipe C tool), downsamples to
SMPRATE, STFTs with stride FFT_STRIDE (the reference hardcodes
FFT_SIZE/4, its process.py:179), and stores the variable-length
complex spectra in an HDF5 file with per-subset split attributes.  Up to
100 corrupt source files are tolerated before aborting, and the RNG is
seeded (SEED=1337) as in the reference.

Schema: single 'features' vlen dataset + 'features_shapes' + a 'split'
attribute table {split, source, start, stop} — readable by
danet_tpu.data.wsj0.Wsj0Dataset (which also reads the reference's
fuel-style per-subset layout).
"""
from __future__ import annotations

import argparse
import os
import random
import sys
from math import ceil

import h5py
import numpy as np
import scipy.io.wavfile
import scipy.signal

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, _REPO)

from danet_tpu.hparams import hparams  # noqa: E402

hparams.load_json(os.path.join(_REPO, "default.json"))
hparams.digest()

FFT_SIZE = hparams.FFT_SIZE
FFT_STRIDE = hparams.FFT_STRIDE
FFT_WND = hparams.FFT_WND_ARRAY
SMPRATE = hparams.SMPRATE
FLOATX = hparams.FLOATX
COMPLEXX = hparams.COMPLEXX
SEED = 1337
FILENAME = "wsj0-danet.hdf5"
MAX_ERRORS = 100


def _resample(rate: int, data: np.ndarray, smprate: int) -> np.ndarray:
    """Integer-factor downsample via reshape+mean, else scipy resample
    (reference WSJ0/process.py:50-64)."""
    if rate == smprate:
        return data.astype(FLOATX)
    if (rate % smprate) == 0:
        factor = rate // smprate
        data = np.pad(data, [(0, (-len(data)) % factor)], mode="constant")
        return data.reshape(len(data) // factor, factor).astype(
            FLOATX).mean(axis=1)
    newlen = int(ceil(len(data) * (smprate / rate)))
    return scipy.signal.resample(data, newlen).astype(FLOATX)


def load_sphere(fname: str, smprate: int = 16000) -> np.ndarray:
    """Decode a NIST SPHERE file to float samples at `smprate`.

    Prefers the bundled native decoder (danet_tpu.native.sphere); falls
    back to an external sph2pipe binary if present (reference behaviour,
    WSJ0/process.py:46-49)."""
    try:
        from danet_tpu.native.sphere import read_sphere
        rate, data = read_sphere(fname)
    except Exception:
        if os.system("./sph2pipe -f rif %s speech.wav" % fname):
            raise RuntimeError("File is corrupt")
        rate, data = scipy.io.wavfile.read("speech.wav")
    return _resample(rate, data, smprate)


def load_sphere_chunk(fnames, smprate: int = 16000, n_threads: int = 8):
    """Decode a list of SPHERE files with the native C++ thread pool;
    falls back to sequential load_sphere.  Yields ndarray-or-Exception
    per file."""
    try:
        from danet_tpu.native.sphere import read_sphere_batch
        results = read_sphere_batch(list(fnames), n_threads=n_threads)
    except Exception:
        results = None
    if results is None:
        for f in fnames:
            try:
                yield load_sphere(f, smprate)
            except Exception as e:
                yield e
        return
    for res in results:
        if isinstance(res, Exception):
            yield res
        else:
            yield _resample(res[0], res[1], smprate)


def _stft_stream(files, on_error):
    """Decode+STFT the file list in native-pool chunks, yielding complex
    [T, F] spectra; decode failures go through on_error (which may raise
    past MAX_ERRORS) and are skipped."""
    CHUNK = 64  # native thread-pool batch decode granularity
    for c0 in range(0, len(files), CHUNK):
        for wav in load_sphere_chunk(files[c0:c0 + CHUNK], SMPRATE):
            if isinstance(wav, Exception):
                on_error(wav)
                continue
            # stride from hparams (FFT_STRIDE) so the offline spectra
            # match the runtime iSTFT framing — the reference hardcodes
            # stride=FFT_SIZE/4, which is the default config but would
            # silently mis-frame under any other FFT_STRIDE (reference
            # WSJ0/process.py:179)
            yield scipy.signal.stft(
                wav.astype(FLOATX), window=FFT_WND, nperseg=FFT_SIZE,
                noverlap=FFT_SIZE - FFT_STRIDE)[2].T.astype(COMPLEXX)


def _error_counter():
    state = {"n": 0}

    def on_error(exc):
        state["n"] += 1
        if state["n"] > MAX_ERRORS:
            sys.stderr.write("Too many file reading failures, abort."
                             " Raising latest exception:\n")
            raise exc

    return state, on_error


def write_fuel_layout(path, subsets):
    """Write the REFERENCE stack's fuel-H5PYDataset schema (its
    WSJ0/process.py:148-222): per-subset '{name}_spectra' vlen datasets
    with attached 'shapes'/'shape_labels' dim scales and the 7-field
    fuel split attribute — so a corpus produced HERE is readable by the
    reference's fuel loader (bidirectional interop; the loader here
    already reads both layouts, danet_tpu/data/wsj0.py)."""
    with h5py.File(path, "w") as out:
        data_t = h5py.special_dtype(vlen=np.dtype(COMPLEXX))
        sizes = []
        for name, files in subsets:
            sys.stdout.write('Generating subset "%s" ...' % name)
            sys.stdout.flush()
            ds = out.create_dataset(
                "%s_spectra" % name, (len(files),), dtype=data_t)
            ds_shapes = out.create_dataset(
                "%s_spectra_shapes" % name, (len(files), 2),
                dtype=np.int32)
            ds_labels = out.create_dataset(
                "%s_spectra_shape_labels" % name, (2,), dtype="S8")
            ds_labels[...] = [b"length", b"fft_size"]
            state, on_error = _error_counter()
            i = 0
            for spectra in _stft_stream(files, on_error):
                ds[i] = spectra.flatten()
                ds_shapes[i] = (len(spectra), 1 + FFT_SIZE // 2)
                i += 1
                sys.stdout.write(".")
                sys.stdout.flush()
            # fuel's dim-scale plumbing (create_scale is the legacy h5py
            # API the reference used; make_scale is its modern spelling)
            ds_shapes.make_scale("shapes")
            ds_labels.make_scale("shape_labels")
            ds.dims[0].attach_scale(ds_shapes)
            ds.dims[0].attach_scale(ds_labels)
            sizes.append(i)
            sys.stdout.write(" done (%d ok, %d failed)\n"
                             % (i, state["n"]))
        split_dt = np.dtype([
            ("split", "a5"), ("source", "a15"),
            ("start", np.int64), ("stop", np.int64),
            ("indices", h5py.special_dtype(ref=h5py.Reference)),
            ("available", np.bool_), ("comment", "a1")])
        split_array = np.empty(len(subsets), dtype=split_dt)
        for k, ((name, _), size) in enumerate(zip(subsets, sizes)):
            split_array[k] = (name.encode(), ("%s_spectra" % name).encode(),
                              0, size, h5py.Reference(), True, b".")
        out.attrs["split"] = split_array


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output-file", default=FILENAME,
                        help="path to output HDF5 file")
    parser.add_argument("--list-dir", default=".",
                        help="directory containing *_set_files lists")
    parser.add_argument("--fuel-layout", action="store_true",
                        help="write the reference stack's fuel-"
                             "H5PYDataset schema (per-subset datasets + "
                             "dim scales) instead of the native single-"
                             "table layout, for consumption by the "
                             "reference's loader")
    args = parser.parse_args()

    subsets = []
    for name in ["train", "valid", "test"]:
        with open(os.path.join(args.list_dir,
                               "%s_set_files" % name), "r") as f:
            files = sorted(line.strip() for line in f if line.strip())
        subsets.append((name, files))

    random.seed(SEED)
    np.random.seed(SEED)

    if args.fuel_layout:
        write_fuel_layout(args.output_file, subsets)
        print("Wrote %s (fuel layout)" % args.output_file)
        return

    total = sum(len(fl) for _, fl in subsets)
    with h5py.File(args.output_file, "w") as out:
        data_t = h5py.special_dtype(vlen=np.dtype(COMPLEXX))
        feats = out.create_dataset("features", (total,), dtype=data_t)
        shapes = out.create_dataset(
            "features_shapes", (total, 2), dtype=np.int32)
        split_rows = []
        row = 0
        for name, files in subsets:
            sys.stdout.write('Generating subset "%s" ...' % name)
            sys.stdout.flush()
            start = row
            state, on_error = _error_counter()
            for spectra in _stft_stream(files, on_error):
                feats[row] = spectra.flatten()
                shapes[row] = (len(spectra), 1 + FFT_SIZE // 2)
                row += 1
                sys.stdout.write(".")
                sys.stdout.flush()
            split_rows.append((name.encode(), b"features", start, row))
            sys.stdout.write(" done (%d ok, %d failed)\n"
                             % (row - start, state["n"]))
        split_dt = np.dtype([
            ("split", "S8"), ("source", "S16"),
            ("start", np.int64), ("stop", np.int64)])
        out.attrs["split"] = np.asarray(split_rows, dtype=split_dt)
    print("Wrote %s" % args.output_file)


if __name__ == "__main__":
    main()
