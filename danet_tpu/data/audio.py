"""Host-side audio / DSP utilities: WAV I/O, STFT, iSTFT, padding.

Reimplements the reference wav/STFT helpers
(/root/reference/app/utils.py:53-135) with the same semantics:
scipy-convention STFT at hparams.SMPRATE, window**2-normalized overlap-add
iSTFT, and the random left/right zero-pad train-time augmentation.  These run
on the host feeding numpy arrays into the device pipeline; the device-side
equivalents (GEMM-native) live in danet_tpu.ops.dsp.
"""
from __future__ import annotations

from math import ceil
import random

import numpy as np
import scipy.io.wavfile
import scipy.signal

from danet_tpu.hparams import hparams


def to_ri(x: np.ndarray) -> np.ndarray:
    """complex [...,] -> float [..., 2] (device-side ri layout)."""
    return np.stack([x.real, x.imag], axis=-1).astype(np.float32)


def from_ri(x: np.ndarray) -> np.ndarray:
    """float [..., 2] -> complex64."""
    return (x[..., 0] + 1j * x[..., 1]).astype(np.complex64)


def stft_np(data: np.ndarray, fft_size=None, stride=None,
            window=None) -> np.ndarray:
    """scipy-convention STFT -> complex [T, F] (reference utils.py:117-122)."""
    fft_size = fft_size if fft_size is not None else hparams.FFT_SIZE
    stride = stride if stride is not None else hparams.FFT_STRIDE
    window = window if window is not None else hparams.FFT_WND_ARRAY
    zxx = scipy.signal.stft(
        data, window=window, nperseg=fft_size,
        noverlap=fft_size - stride)[2]
    return zxx.astype(np.complex64).T


def istft_np(spectra: np.ndarray, stride=None, window=None) -> np.ndarray:
    """Overlap-add iSTFT with window**2 normalization.

    Vectorized numpy equivalent of the reference's Python loop
    (utils.py:53-75): output length T*stride, frames at i*stride for
    i*stride < T*stride - fft_size, zero-division-guarded normalization.
    """
    stride = stride if stride is not None else hparams.FFT_STRIDE
    window = window if window is not None else hparams.FFT_WND_ARRAY
    fft_size = (spectra.shape[1] - 1) * 2
    out_len = spectra.shape[0] * stride
    n_used = max(0, -(-(out_len - fft_size) // stride))
    frames = np.fft.irfft(spectra[:n_used], axis=-1).real * window
    out = np.zeros(out_len, dtype=np.float64)
    wsum = np.zeros(out_len, dtype=np.float64)
    w2 = np.asarray(window, dtype=np.float64) ** 2
    for i in range(n_used):
        out[i * stride:i * stride + fft_size] += frames[i]
        wsum[i * stride:i * stride + fft_size] += w2
    pos = wsum != 0
    out[pos] /= wsum[pos]
    return out


def spectra_to_wave(spectra: np.ndarray, fft_size=None, stride=None,
                    window=None) -> np.ndarray:
    """Exact waveform whose ``stft_np`` reproduces ``spectra``.

    Inverts the scipy-convention STFT the offline pipelines store
    (TIMIT/WSJ0 pickles/HDF5 hold complex [T, F] spectra of raw
    int16-scale samples) back to the [(T-1)*stride] sample vector —
    scipy.signal.istft is the exact inverse of scipy.signal.stft
    including its boundary-zeros handling, so re-STFT'ing the result
    matches the stored spectra to float precision (~1e-7 relative) and
    the samples recover the 16-bit-origin material to well under half an
    int16 LSB (measured ~0.006).  This is what lets the spectra-only
    reference corpora ride the int16 wave wire (TRANSFER_DOMAIN='wave'):
    the artifacts on disk stay spectra, the wire moves 8x fewer bytes.
    """
    fft_size = fft_size if fft_size is not None else hparams.FFT_SIZE
    stride = stride if stride is not None else hparams.FFT_STRIDE
    window = window if window is not None else hparams.FFT_WND_ARRAY
    _, wav = scipy.signal.istft(
        np.asarray(spectra).T, window=window, nperseg=fft_size,
        noverlap=fft_size - stride)
    target = (spectra.shape[0] - 1) * stride
    if len(wav) > target:
        wav = wav[:target]
    elif len(wav) < target:
        wav = np.pad(wav, (0, target - len(wav)))
    return wav.astype(np.float32)


def random_zeropad(x: np.ndarray, padlen: int, axis: int = -1) -> np.ndarray:
    """Zero-pad with a random left/right split summing to padlen —
    train-time padding augmentation (reference utils.py:78-92)."""
    if padlen == 0:
        return x
    left = random.randint(0, padlen)
    right = padlen - left
    axis %= x.ndim
    pad = [(0, 0)] * axis + [(left, right)] + [(0, 0)] * (x.ndim - axis - 1)
    return np.pad(x, pad, mode="constant")


def load_wavfile(filename: str) -> np.ndarray:
    """WAV -> resample to hparams.SMPRATE -> STFT -> complex [T, F]
    (reference utils.py:95-122)."""
    if filename is None:
        raise IOError(
            "WAV file not specified, please specify via "
            "--input-file argument.")
    smprate, data = scipy.io.wavfile.read(filename)
    if data.ndim > 1:
        data = data.mean(axis=-1)
    if smprate != hparams.SMPRATE:
        data = scipy.signal.resample(
            data, int(ceil(len(data) * hparams.SMPRATE / smprate)))
    return stft_np(np.asarray(data, dtype=np.float64))


def save_wavfile(filename: str, spectra: np.ndarray) -> None:
    """complex [T, F] -> iSTFT -> WAV at hparams.SMPRATE
    (reference utils.py:125-135)."""
    data = istft_np(spectra)
    scipy.io.wavfile.write(filename, hparams.SMPRATE, data)


def load_wav_raw(filename: str, smprate: int, normalize: bool = True,
                 with_dtype: bool = False):
    """WAV -> mono float32 waveform resampled to `smprate`.

    Raw-waveform twin of load_wavfile for the fused on-device DSP paths
    (DaNet.separate_wav, serve artifacts) — no host STFT, no hparams
    dependency.

    normalize=False keeps the file's NATIVE sample values bit-faithfully
    (8-bit WAVs keep their unsigned +128 offset), i.e. exactly the
    samples load_wavfile STFTs — so a wave-wire epoch built on it
    matches the spectra contract for every source dtype, not just 16-bit
    PCM.  with_dtype=True returns ``(wav, source_dtype)`` so callers can
    validate quantized-wire assumptions (e.g. the int16 wire is only
    exact for int16 sources)."""
    in_rate, data = scipy.io.wavfile.read(filename)
    dtype = data.dtype
    data = np.asarray(data, dtype=np.float64)
    if normalize and np.issubdtype(dtype, np.integer):
        # scale per sample width; scipy reads 8-bit WAV as unsigned
        # (centered at 128), wider widths as signed
        info = np.iinfo(dtype)
        if info.min == 0:
            data = data - (info.max + 1) / 2.0
        data = data / ((info.max + 1) / 2.0 if info.min == 0
                       else info.max + 1.0)
    if data.ndim > 1:
        data = data.mean(axis=-1)
    if in_rate != smprate:
        data = scipy.signal.resample(
            data, int(ceil(len(data) * smprate / in_rate)))
    out = data.astype(np.float32)
    return (out, dtype) if with_dtype else out


def save_wav_raw(filename: str, wav: np.ndarray, smprate: int,
                 scale: float = None) -> None:
    """float waveform -> 16-bit WAV at `smprate`.

    ``scale``: optional shared normalization divisor.  Stems of one
    separation should pass the same value (e.g. the max peak across all
    stems) so their relative levels survive — independent per-file peak
    normalization would attenuate each stem by a different factor."""
    wav = np.asarray(wav, dtype=np.float64)
    if scale is None:
        # attenuate only if out of range; quiet signals pass unchanged
        scale = max(float(np.max(np.abs(wav))), 1.0)
    pcm = np.clip(wav / max(float(scale), 1e-12), -1.0, 1.0)
    scipy.io.wavfile.write(
        filename, smprate, (pcm * 32767.0).astype(np.int16))
