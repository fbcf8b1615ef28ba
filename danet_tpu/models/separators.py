"""Separators: dot-product masks (sigmoid / softmax).

Re-implementations of the reference separator registry
(/root/reference/app/modules.py:548-604).  Logits = embedding-attractor dot
products (one batched GEMM), masks via sigmoid or softmax-over-sources,
applied to the mixture magnitude.  XLA fuses mask + multiply + transpose
into the surrounding computation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from danet_tpu.hparams import hparams
from danet_tpu.models.base import Separator
from danet_tpu.ops.nn import ee


class _DotSeparator(Separator):
    def _masks(self, logits):
        raise NotImplementedError()

    def apply(self, params, mix_pwr, attractors, embed_flat):
        hp = self.hp
        b, t, f = mix_pwr.shape
        # [B, TF, E] @ [B, E, N] -> [B, TF, N]
        logits = ee("bke,bne->bkn", embed_flat,
                    attractors.astype(embed_flat.dtype))
        logits = logits.reshape(b, t, f, -1)
        masks = self._masks(logits).astype(mix_pwr.dtype)
        sep = mix_pwr[..., None] * masks          # [B, T, F, N]
        return jnp.transpose(sep, (0, 3, 1, 2))   # [B, N, T, F]


@hparams.register_separator("dot-sigmoid-orig")
class DotSeparatorSigmoid(_DotSeparator):
    """Sigmoid masks — the default (reference modules.py:548-574)."""

    def _masks(self, logits):
        return jax.nn.sigmoid(logits)


@hparams.register_separator("dot-softmax-orig")
class DotSeparatorSoftmax(_DotSeparator):
    """Softmax-over-sources masks (reference modules.py:577-604)."""

    def _masks(self, logits):
        return jax.nn.softmax(logits, axis=-1)
