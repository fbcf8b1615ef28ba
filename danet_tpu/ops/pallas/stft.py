"""Pallas TPU kernel: fused framing + windowed DFT (STFT front-end).

One kernel pass replaces the XLA framing-gather + matmul pipeline of
ops/dsp.py.  The overlapped-frame matmul is decomposed so no unaligned
in-VMEM framing is needed: with R = fft_size/stride sub-windows, frame j
satisfies

    Z[j] = sum_{k<R} x2d[j + k] @ W_k,

where x2d is the signal viewed as [rows, stride] and W_k is the k-th
stride-row band of the windowed DFT basis.  The R row-shifted views are
cheap XLA slices streamed through standard BlockSpecs (automatic double
buffering); the kernel issues R MXU GEMMs of shape
[FRAMES_BLK, stride] x [stride, 2F] — identical total FLOPs to the dense
framing GEMM — and fuses magnitude / log1p feature extraction into the
same pass when requested.

Constraints: stride | fft_size (reference DSP config: 256/64).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from danet_tpu.ops import dsp

FRAMES_BLK = 128  # frames per grid step (MXU-aligned M dimension)


_BASIS_CACHE: dict = {}


def _basis_banded(fft_size: int, stride: int, window: np.ndarray):
    """Windowed DFT basis [fft_size, 2F] split into R [stride, 2F] bands.

    Cached per (fft_size, stride, window bytes) — eager callers (per-
    request serving) would otherwise rebuild and re-upload the constant
    on every call (dsp._dft_basis is lru_cached for the same reason).
    """
    key = (fft_size, stride, window.tobytes())
    hit = _BASIS_CACHE.get(key)
    if hit is not None:
        return hit
    cos_b, sin_b = dsp._dft_basis(fft_size, "float32")
    scale = 1.0 / float(np.sum(window))
    w = window.astype(np.float64)[:, None] * scale
    full = np.concatenate([w * cos_b, w * sin_b], axis=1).astype(np.float32)
    r = fft_size // stride
    out = np.ascontiguousarray(
        full.reshape(r, stride, full.shape[1]))  # [R, stride, 2F]
    _BASIS_CACHE[key] = out
    return out


def _stft_kernel(*refs, n_bands: int, feat: int, logmag: bool):
    band_refs = refs[:n_bands]
    wband_ref = refs[n_bands]
    out_a_ref, out_b_ref = refs[n_bands + 1], refs[n_bands + 2]

    acc = None
    for k in range(n_bands):
        part = jnp.dot(band_refs[k][0], wband_ref[k],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part

    re, im = acc[:, :feat], acc[:, feat:]
    if logmag:
        mag = jnp.sqrt(re * re + im * im)
        out_a_ref[0] = mag
        out_b_ref[0] = jnp.log1p(mag)
    else:
        out_a_ref[0] = re
        out_b_ref[0] = im


@functools.partial(jax.jit, static_argnames=("fft_size", "stride", "logmag"))
def _stft_pallas_padded(x2d: jnp.ndarray, wbands, fft_size: int,
                        stride: int, logmag: bool):
    b, n_rows, _ = x2d.shape
    n_bands = fft_size // stride
    n_frames = n_rows - (n_bands - 1)
    assert n_frames % FRAMES_BLK == 0, n_frames
    n_blocks = n_frames // FRAMES_BLK
    feat = fft_size // 2 + 1

    # R shifted views of the row matrix; XLA slices, streamed by BlockSpec
    shifted = [jax.lax.slice_in_dim(x2d, k, k + n_frames, axis=1)
               for k in range(n_bands)]

    out_a, out_b = pl.pallas_call(
        functools.partial(_stft_kernel, n_bands=n_bands, feat=feat,
                          logmag=logmag),
        grid=(b, n_blocks),
        in_specs=(
            [pl.BlockSpec((1, FRAMES_BLK, stride), lambda bi, i: (bi, i, 0),
                          memory_space=pltpu.VMEM)] * n_bands
            + [pl.BlockSpec((n_bands, stride, 2 * feat),
                            lambda bi, i: (0, 0, 0),
                            memory_space=pltpu.VMEM)]),
        out_specs=[
            pl.BlockSpec((1, FRAMES_BLK, feat), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FRAMES_BLK, feat), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_frames, feat), jnp.float32),
            jax.ShapeDtypeStruct((b, n_frames, feat), jnp.float32),
        ],
    )(*shifted, wbands)
    return jnp.stack([out_a, out_b], axis=-1)


def stft_ri_pallas(x: jnp.ndarray, fft_size: int, stride: int,
                   window: np.ndarray, logmag: bool = False) -> jnp.ndarray:
    """Fused STFT via the Pallas kernel: [B, L] -> ri [B, T, F, 2]
    (or (|Z|, log1p|Z|) stacked when logmag=True).

    Matches ops.dsp.stft_ri / scipy conventions (boundary zeros, padded,
    1/sum(window) scaling); see tests/test_pallas.py.
    """
    assert fft_size % stride == 0, "pallas STFT needs stride | fft_size"
    if x.ndim == 1:
        return stft_ri_pallas(x[None], fft_size, stride, window, logmag)[0]
    b, n = x.shape
    half = fft_size // 2
    n_bands = fft_size // stride
    # scipy boundary + end padding (as dsp.frame_signal), then pad frame
    # count to a FRAMES_BLK multiple
    padded = n + 2 * half
    nadd = (-(padded - fft_size) % stride) % stride
    n_frames = (padded + nadd - fft_size) // stride + 1
    n_frames_pad = -(-n_frames // FRAMES_BLK) * FRAMES_BLK
    n_rows = n_frames_pad + n_bands - 1
    lp = n_rows * stride
    xp = jnp.pad(x.astype(jnp.float32), [(0, 0), (half, lp - n - half)])
    x2d = xp.reshape(b, n_rows, stride)

    wbands = jnp.asarray(_basis_banded(fft_size, stride, window))
    out = _stft_pallas_padded(x2d, wbands, fft_size, stride, logmag)
    return out[:, :n_frames]
