"""Attractor estimators: truth / truth-threshold / truth-weighted / anchor.

TPU-native re-implementations of the reference estimator registry
(/root/reference/app/modules.py:382-545).  The reference computes per-source
means with ``tf.map_fn`` + ``unsorted_segment_sum``; here the hard assignment
becomes a one-hot tensor and every segment mean is a single batched einsum —
a GEMM on the MXU with no scatter, no host loop, and a trivially clean
gradient.  The anchored estimator is pure einsum/argmin and maps 1:1 to XLA.
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from danet_tpu.hparams import hparams
from danet_tpu.models.base import Estimator
from danet_tpu.ops.nn import ee


def _flatten_embed(embed):
    """[B, T, F, E] -> [B, T*F, E]"""
    b, t, f, e = embed.shape
    return embed.reshape(b, t * f, e)


def _hard_assignment(src_pwr):
    """One-hot dominant-source assignment per TF bin.

    src_pwr: [B, N, T, F] -> one-hot [B, T*F, N]
    (argmax as in reference modules.py:396).
    """
    b, n = src_pwr.shape[0], src_pwr.shape[1]
    labels = jnp.argmax(src_pwr, axis=1)          # [B, T, F]
    onehot = jax.nn.one_hot(labels, n, dtype=src_pwr.dtype)
    return onehot.reshape(b, -1, n)               # [B, TF, N]


@hparams.register_estimator("truth")
class AverageEstimator(Estimator):
    """Plain per-source mean of embeddings (reference modules.py:382-412).

    Keeps the reference's ``/(count + 1)`` denominator (modules.py:407) for
    metric parity — documented quirk, not a standard mean.
    """

    USE_TRUTH = True

    def apply(self, params, embed, src_pwr=None, mix_pwr=None):
        embed_flat = _flatten_embed(embed)
        onehot = _hard_assignment(src_pwr)
        onehot = onehot.astype(embed_flat.dtype)
        sums = ee("bkn,bke->bne", onehot, embed_flat)
        counts = jnp.sum(onehot, axis=1)          # [B, N]
        return sums / (counts[..., None] + 1.0)


@hparams.register_estimator("truth-threshold")
class ThresholdedAverageEstimator(Estimator):
    """Mean over bins whose mixture magnitude exceeds 5
    (reference modules.py:415-450)."""

    USE_TRUTH = True

    def apply(self, params, embed, src_pwr=None, mix_pwr=None):
        hp = self.hp
        embed_flat = _flatten_embed(embed)
        onehot = _hard_assignment(src_pwr)
        b = embed.shape[0]
        w = (mix_pwr.reshape(b, -1, 1) > 5.0).astype(embed_flat.dtype)
        # fold the bin weight into the [B, TF, N] assignment (N << E)
        # instead of scaling the [B, TF, E] embeddings: same contraction
        # (sum_k onehot*w*embed), but no embed-sized temporary and the
        # weight-sum reduction rides the same small tensor — one GEMM +
        # one reduce instead of two GEMMs over an extra E-wide pass.
        wgt = onehot.astype(embed_flat.dtype) * w
        sums = ee("bkn,bke->bne", wgt, embed_flat)
        wsum = jnp.sum(wgt, axis=1)[..., None]
        return sums / (wsum + hp.EPS)


@hparams.register_estimator("truth-weighted")
class WeightedAverageEstimator(Estimator):
    """Mixture-magnitude-weighted mean — the default train estimator
    (reference modules.py:453-487, default.json:29)."""

    USE_TRUTH = True

    def apply(self, params, embed, src_pwr=None, mix_pwr=None):
        hp = self.hp
        embed_flat = _flatten_embed(embed)
        onehot = _hard_assignment(src_pwr)
        b = embed.shape[0]
        w = mix_pwr.reshape(b, -1, 1).astype(embed_flat.dtype)
        # weight folded into the [B, TF, N] assignment, not the
        # [B, TF, E] embeddings — see ThresholdedAverageEstimator
        wgt = onehot.astype(embed_flat.dtype) * w
        sums = ee("bkn,bke->bne", wgt, embed_flat)
        wsum = jnp.sum(wgt, axis=1)[..., None]
        return sums / (wsum + hp.EPS)


@hparams.register_estimator("kmeans")
class KMeansEstimator(Estimator):
    """Truth-free k-means attractor estimation (DaNet paper's test-time
    alternative; listed in BASELINE.json configs, absent in the reference).

    Centroids are initialized from the anchor mechanism (trainable anchors,
    min-similarity subset — eq. 6-9) and refined with KMEANS_ITER rounds of
    mixture-power-weighted soft assignment / mean updates.  Everything is
    dense einsums inside a fori_loop — no data-dependent shapes.
    """

    USE_TRUTH = False

    def init(self, rng):
        hp = self.hp
        return {
            "anchors": jax.random.normal(
                rng, (hp.NUM_ANCHOR, hp.EMBED_SIZE), dtype=jnp.float32),
        }

    def apply(self, params, embed, src_pwr=None, mix_pwr=None):
        hp = self.hp
        n_iter = getattr(hp, "KMEANS_ITER", None)
        n_iter = 5 if n_iter is None else int(n_iter)
        embed_flat = _flatten_embed(embed)             # [B, K, E]
        # bin weights: mixture power if available, else uniform
        if mix_pwr is not None:
            w = mix_pwr.reshape(embed.shape[0], -1, 1).astype(
                embed_flat.dtype)
        else:
            w = jnp.ones(embed_flat.shape[:2] + (1,), embed_flat.dtype)

        # anchor-based initialization (same as AnchoredEstimator)
        init = AnchoredEstimator.apply(self, params, embed)

        def step(_, centroids):
            # soft assignment by dot-product similarity (softmax over N)
            logits = ee("bke,bne->bkn", embed_flat,
                        centroids.astype(embed_flat.dtype))
            assign = jax.nn.softmax(logits, axis=-1) * w   # [B, K, N]
            sums = ee("bkn,bke->bne", assign, embed_flat)
            wsum = jnp.sum(assign, axis=1)[..., None]
            return (sums / (wsum + hp.EPS)).astype(centroids.dtype)

        return jax.lax.fori_loop(0, n_iter, step, init)


@hparams.register_estimator("anchor")
class AnchoredEstimator(Estimator):
    """Trainable anchors + softmax assignment + min-similarity subset pick —
    the inference-time estimator (reference modules.py:490-545, DaNet paper
    eq. 6-9).  All dense einsums; the subset choice is an argmin-gather over
    the C(NUM_ANCHOR, N) combinations."""

    USE_TRUTH = False

    def init(self, rng):
        hp = self.hp
        return {
            "anchors": jax.random.normal(
                rng, (hp.NUM_ANCHOR, hp.EMBED_SIZE), dtype=jnp.float32),
        }

    def apply(self, params, embed, src_pwr=None, mix_pwr=None):
        hp = self.hp
        n = hp.MAX_N_SIGNAL
        combs = np.asarray(
            list(itertools.combinations(range(hp.NUM_ANCHOR), n)),
            dtype=np.int32)
        anchors = params["anchors"].astype(embed.dtype)
        anchor_sets = anchors[jnp.asarray(combs)]              # [P, N, E]

        # eq (6): soft assignment of each TF bin to the anchors in a subset
        logits = ee("btfe,pce->bptfc", embed, anchor_sets)
        assignment = jax.nn.softmax(logits, axis=-1)

        # eq (7): assignment-weighted mean embedding per anchor
        attractor_sets = ee("bptfc,btfe->bpce", assignment, embed)
        attractor_sets = attractor_sets / jnp.sum(
            assignment.astype(jnp.float32), axis=(2, 3)
        )[..., None].astype(embed.dtype)

        # eq (8): in-set max pairwise similarity between DISTINCT
        # attractors.  The reference takes the max over the full Gram
        # including the diagonal (modules.py:526-531); by Cauchy-Schwarz
        # a.b <= max(|a|^2, |b|^2), so its criterion degenerates to
        # "smallest max attractor norm", ignoring actual pairwise
        # similarity — a documented fix (SURVEY.md appendix policy).
        sim = ee("bpce,bpde->bpcd", attractor_sets, attractor_sets)
        n_set = sim.shape[-1]
        diag = jnp.eye(n_set, dtype=bool)
        sim = jnp.where(diag, -jnp.inf, sim.astype(jnp.float32))
        in_set_sim = jnp.max(sim, axis=(-1, -2))

        # eq (9): pick the least-similar subset
        choice = jnp.argmin(in_set_sim, axis=1)               # [B]
        return jnp.take_along_axis(
            attractor_sets, choice[:, None, None, None], axis=1)[:, 0]
