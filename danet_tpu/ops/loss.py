"""Losses and metrics: permutation-invariant MSE, batched SNR.

TPU-native reimplementation of the reference op library's loss/metric ops
(/root/reference/app/ops.py:191-222 batch_snr, ops.py:374-431 pit_mse_loss).
The permutation search is a dense einsum against a constant one-hot
permutation stack — N! is tiny (N=2..4 speakers), so the full cost matrix +
argmin maps onto one fused XLA computation with no data-dependent control
flow.
"""
from __future__ import annotations

import itertools
from math import factorial

import jax
import jax.numpy as jnp
import numpy as np


def permutations_array(n: int) -> np.ndarray:
    """All permutations of range(n) as an int32 [n!, n] array."""
    return np.asarray(list(itertools.permutations(range(n))), dtype=np.int32)


def _squared_error(x: jnp.ndarray, y: jnp.ndarray,
                   complex_ri: bool) -> jnp.ndarray:
    """Complex-aware squared error (reference ops.py:414-421).

    With complex_ri=True the trailing axis holds (real, imag) and the
    squared error is re^2 + im^2 of the difference — the device-side
    representation of complex spectra on TPU (complex dtypes stay off
    device; see ops/dsp.py).
    """
    d = x - y
    if complex_ri:
        return jnp.sum(jnp.square(d), axis=-1)
    if jnp.iscomplexobj(x) and jnp.iscomplexobj(y):
        return jnp.square(jnp.real(d)) + jnp.square(jnp.imag(d))
    return jnp.square(d)


def pit_mse_loss(x: jnp.ndarray, y: jnp.ndarray, pit_axis: int = 1,
                 complex_ri: bool = False):
    """Permutation-invariant MSE between per-source tensors.

    Semantics match reference ops.py:374-431: per-(i,j) mean squared error
    over all non-PIT axes, cost of a permutation = SUM over sources of the
    per-pair means, argmin over the N! permutations, mean over batch.

    Args:
        x: target, [B, N, ...] (real, complex, or ri-stacked)
        y: prediction, [B, N, ...]
        pit_axis: axis holding the N sources (must be 1 currently)
        complex_ri: last axis of x/y is a (real, imag) pair; squared error
            sums over it, and it is excluded from the mean (so the loss
            equals the complex-input formulation exactly).

    Returns:
        (loss, perms, perm_idx): scalar loss; int32 [N!, N] permutation
        table; int32 [B] chosen permutation index per batch element.
        ``perms[perm_idx[b], i]`` gives the prediction index matched to
        target source i — use with jnp.take_along_axis to un-permute.
    """
    assert pit_axis == 1, "PIT axis must be the source axis (1)"
    n = x.shape[pit_axis]
    perms = permutations_array(n)
    n_perm = factorial(n)
    # one-hot permutation stack: [P, N, N]
    onehot = np.zeros((n_perm, n, n), dtype=np.float32)
    onehot[np.arange(n_perm)[:, None], np.arange(n)[None, :], perms] = 1.0

    xs = jnp.expand_dims(x, pit_axis + 1)   # [B, N, 1, ...]
    ys = jnp.expand_dims(y, pit_axis)       # [B, 1, N, ...]
    sq = _squared_error(xs, ys, complex_ri)
    reduce_axes = tuple(range(3, sq.ndim))
    cross = jnp.mean(sq, axis=reduce_axes)  # [B, N, N]
    loss_sets = jnp.einsum("bij,pij->bp", cross, jnp.asarray(onehot))
    perm_idx = jnp.argmin(loss_sets, axis=1)
    loss = jnp.mean(jnp.take_along_axis(
        loss_sets, perm_idx[:, None], axis=1))
    return loss, jnp.asarray(perms), perm_idx


def unpermute(y: jnp.ndarray, perms: jnp.ndarray,
              perm_idx: jnp.ndarray) -> jnp.ndarray:
    """Reorder predictions [B, N, ...] by the chosen PIT permutation.

    Equivalent of the reference's gather_nd un-permute (main.py:293-306):
    output[b, i] = y[b, perms[perm_idx[b], i]].
    """
    sel = perms[perm_idx]  # [B, N]
    sel = sel.reshape(sel.shape + (1,) * (y.ndim - 2))
    return jnp.take_along_axis(y, sel.astype(jnp.int32), axis=1)


def batch_snr(clear_signal: jnp.ndarray, noisy_signal: jnp.ndarray,
              eps: float = 1e-7, complex_ri: bool = False) -> jnp.ndarray:
    """Batched SNR in dB, zero-mean assumption (reference ops.py:191-222).

    Complex inputs (dtype-complex, or ri-stacked when complex_ri=True) are
    compared via squared magnitudes of signal and of the complex residual;
    note |z|^2 = re^2 + im^2 needs no sqrt. Returns a vector [batch].
    """
    noise = clear_signal - noisy_signal
    if complex_ri:
        # mean over all non-batch axes of the *magnitude squared*: sum the
        # ri axis but keep the mean's denominator excluding it.
        reduce_axes = tuple(range(1, clear_signal.ndim - 1))
        sig_pwr = jnp.mean(
            jnp.sum(jnp.square(clear_signal), axis=-1), axis=reduce_axes)
        noise_pwr = jnp.mean(
            jnp.sum(jnp.square(noise), axis=-1), axis=reduce_axes)
    else:
        if jnp.iscomplexobj(clear_signal):
            clear_signal = jnp.abs(clear_signal)
            noise = jnp.abs(noise)
        reduce_axes = tuple(range(1, clear_signal.ndim))
        sig_pwr = jnp.mean(jnp.square(clear_signal), axis=reduce_axes)
        noise_pwr = jnp.mean(jnp.square(noise), axis=reduce_axes)
    coeff = 4.342944819  # 10 / ln(10)
    return coeff * (jnp.log(sig_pwr + eps) - jnp.log(noise_pwr + eps))


def si_snr(target: jnp.ndarray, estimate: jnp.ndarray,
           eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SNR (dB) over the last axis; extra eval metric.

    Not present in the reference (which reports plain SNR); standard for
    modern speech-separation evaluation on WSJ0-2mix.
    """
    target = target - jnp.mean(target, axis=-1, keepdims=True)
    estimate = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
    dot = jnp.sum(target * estimate, axis=-1, keepdims=True)
    t_pwr = jnp.sum(jnp.square(target), axis=-1, keepdims=True)
    proj = dot / (t_pwr + eps) * target
    noise = estimate - proj
    ratio = (jnp.sum(jnp.square(proj), axis=-1)
             / (jnp.sum(jnp.square(noise), axis=-1) + eps))
    return 10.0 * jnp.log10(ratio + eps)


def pit_si_snr_loss(target_wav: jnp.ndarray, estimate_wav: jnp.ndarray,
                    eps: float = 1e-8):
    """Permutation-invariant negative SI-SNR on waveforms (uPIT objective).

    Modern waveform-domain training criterion for WSJ0-2mix-style
    separation; not in the reference (which trains complex-spectrogram
    PIT-MSE only, ops.py:374-431).  Select with TRAIN_LOSS_TYPE
    'pit-si-snr'; targets/estimates are on-device iSTFT reconstructions.

    Args:
        target_wav: [B, N, L] true source waveforms
        estimate_wav: [B, N, L] separated waveforms
    Returns:
        (loss, perms, perm_idx) with the same un-permute contract as
        pit_mse_loss; loss = -mean over batch of the permutation-optimal
        mean SI-SNR (dB), so lower is better.
    """
    n = target_wav.shape[1]
    perms = permutations_array(n)
    n_perm = factorial(n)
    onehot = np.zeros((n_perm, n, n), dtype=np.float32)
    onehot[np.arange(n_perm)[:, None], np.arange(n)[None, :], perms] = 1.0

    cross = si_snr(target_wav[:, :, None], estimate_wav[:, None],
                   eps)                                   # [B, N, N]
    score_sets = jnp.einsum(
        "bij,pij->bp", cross, jnp.asarray(onehot)) / n    # [B, P]
    perm_idx = jnp.argmax(score_sets, axis=1)
    loss = -jnp.mean(jnp.take_along_axis(
        score_sets, perm_idx[:, None], axis=1))
    return loss, jnp.asarray(perms), perm_idx


def combinations_gather(data: jnp.ndarray, subset_size: int) -> jnp.ndarray:
    """Gather all C(total, subset_size) row subsets (reference ops.py:273-292).

    data: [total, ...] -> [C(total, k), k, ...]
    """
    total = data.shape[0]
    combs = np.asarray(
        list(itertools.combinations(range(total), subset_size)),
        dtype=np.int32)
    return data[jnp.asarray(combs)]


def batch_cross_snr(clear_signal: jnp.ndarray, noisy_signal: jnp.ndarray,
                    eps: float = 1e-7,
                    complex_ri: bool = False) -> jnp.ndarray:
    """Pairwise SNR matrix [B, m, n] between per-source stacks
    (reference ops.py:225-258)."""
    xs = jnp.expand_dims(clear_signal, 2)   # [B, m, 1, ...]
    ys = jnp.expand_dims(noisy_signal, 1)   # [B, 1, n, ...]
    noise = xs - ys
    if complex_ri:
        reduce_axes = tuple(range(3, xs.ndim - 1))
        sig_pwr = jnp.mean(jnp.sum(jnp.square(xs), axis=-1),
                           axis=reduce_axes)
        noise_pwr = jnp.mean(jnp.sum(jnp.square(noise), axis=-1),
                             axis=reduce_axes)
    else:
        if jnp.iscomplexobj(xs):
            xs, noise = jnp.abs(xs), jnp.abs(noise)
        reduce_axes = tuple(range(3, xs.ndim))
        sig_pwr = jnp.mean(jnp.square(xs), axis=reduce_axes)
        noise_pwr = jnp.mean(jnp.square(noise), axis=reduce_axes)
    coeff = 4.342944819
    return coeff * (jnp.log(sig_pwr + eps) - jnp.log(noise_pwr + eps))
