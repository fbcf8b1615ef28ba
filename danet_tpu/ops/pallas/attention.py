"""Flash-attention backend for the attention encoders (long-T path).

The dense attention in models/encoders.py materializes [B, H, T, T]
logits — fine at the flagship T=128, quadratic-memory at the tl=512
curriculum stages and long-form inference.  This wraps the stock Pallas
TPU flash-attention kernel (jax.experimental.pallas.ops.tpu.flash_attention:
blockwise online-softmax, O(T) memory, custom VJP) behind the encoder's
``attn_fn(q, k, v, key_mask)`` contract:

  * layout adaptation [B, T, H, D] <-> [B, H, T, D];
  * key padding handled with SegmentIds: real frames are segment 0,
    padded frames segment 1 — padded KEYS are excluded from real queries
    exactly like the dense path's additive mask.  (Padded QUERIES attend
    only among themselves instead of over real keys; their embeddings are
    garbage either way and the separators/estimators weight them by
    mixture power, which is zero on padding.)

Selection: ATTN_BACKEND config key — 'auto' (default) engages flash on
TPU platforms when T is block-aligned and big enough to matter
(>= 256 frames); 'flash' forces it; 'xla' keeps dense attention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def flash_attention_masked(q, k, v, key_mask):
    """attn_fn-contract wrapper: q/k/v [B, T, H, D], key_mask [B, T] bool
    -> [B, T, H, D]."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    qt = jnp.transpose(q, (0, 2, 1, 3))        # [B, H, T, D]
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    sm_scale = 1.0 / float(q.shape[-1]) ** 0.5
    if key_mask is not None and key_mask.dtype == jnp.bool_:
        seg = (~key_mask).astype(jnp.int32)    # 0 = real, 1 = padding
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None
    out = flash_attention(qt, kt, vt, segment_ids=segment_ids,
                          sm_scale=sm_scale)
    return jnp.transpose(out, (0, 2, 1, 3))


def attn_backend_default(t: int, hp=None) -> str:
    """'xla' (dense einsum attention) at every measured size.

    MEASURED r5 (bench.py --seqlen, attn-v1 train step, v5e, bf16): the
    stock flash kernel LOSES to XLA's fused dense attention at this
    model's shapes (4 heads, head dim 64) across the whole range —
    T=256: 11.0 vs 20.7% MFU, T=512: 8.1 vs 15.4, T=1024: 5.6 vs 12.1
    (1.6-1.9x slower throughout) — so 'auto' no longer switches to it
    by sequence length.  'flash' remains an explicit opt-in
    (ATTN_BACKEND='flash') for NON-causal sequences long enough that
    the dense [B, H, T, T] logits do not fit memory; the shipping
    long-context path is ATTN_CAUSAL + the exact chunked banded
    attention (ops/local_attention.py — ~1M frames/s at T=8192 where
    the dense band collapses, PARITY.md), which needs no flash.

    Under tensor parallelism (MESH_MODEL > 1) 'flash' must also never
    auto-engage: the kernel is an opaque pallas_call with no GSPMD
    partitioning rule, so it would silently all-gather the head-sharded
    QKV and run attention replicated on every model shard — the same
    failure mode ops/rnn.py::lstm_backend_default guards for the LSTM
    kernel.  (That guard now coincides with the measured default.)"""
    del t, hp
    return "xla"


def resolve_attn_fn(hp, t: int, dense_fn):
    """Pick the attention implementation for sequence length t."""
    be = getattr(hp, "ATTN_BACKEND", "auto") or "auto"
    if be not in ("auto", "flash", "xla"):
        raise ValueError("Unknown ATTN_BACKEND %r" % (be,))
    if be == "auto":
        be = attn_backend_default(t, hp)
    return flash_attention_masked if be == "flash" else dense_fn
