"""Expert parallelism: soft-mixture MoE MLP sharded over an 'expert' axis.

SURVEY.md §2.4 marks EP out of scope for the reference (no MoE) but
requires that the registry design not preclude one; the 'moe-v1' encoder
(models/encoders.py) adds a mixture-of-experts MLP, and this module is its
multi-chip execution path: expert weights are sharded one-group-per-device
along an 'expert' mesh axis, every device computes its local experts'
contributions for all tokens, and the gated sum reduces over the axis with
one psum — the all-to-all-free dense-dispatch form of expert parallelism
(exact, differentiable; router computation is replicated).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from danet_tpu.ops.nn import ee


def moe_mlp(params, x):
    """Dense soft-mixture MoE MLP on one device.

    params: router [d, E], w_in [E, d, ff], w_out [E, ff, d]
    x: [B, T, d] -> [B, T, d]
    """
    # gate logits + softmax in f32 (same policy as the attention softmax;
    # the gate tensor is tiny, precision matters for routing gradients)
    gate = jax.nn.softmax(
        jnp.einsum("btd,de->bte", x, params["router"].astype(x.dtype),
                   preferred_element_type=jnp.float32), axis=-1)
    hid = jax.nn.gelu(
        ee("btd,edh->ebth", x, params["w_in"].astype(x.dtype)))
    y = ee("ebth,ehd->ebtd", hid, params["w_out"].astype(x.dtype))
    return jnp.einsum("ebtd,bte->btd", y,
                      gate.astype(y.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def moe_mlp_ep(params, x, mesh, expert_axis: str = "expert"):
    """Expert-parallel MoE MLP: experts sharded over `expert_axis`.

    Each device computes its local expert group for all tokens; the gated
    mixture reduces with one psum over the axis.
    """
    n_dev = mesh.shape[expert_axis]
    n_exp = params["w_in"].shape[0]
    assert n_exp % n_dev == 0, "experts must divide across the axis"

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=({"router": P(None, expert_axis),
                   "w_in": P(expert_axis), "w_out": P(expert_axis)}, P()),
        out_specs=P())
    def run(p, x_rep):
        # local gate logits for this device's expert slice; the softmax
        # normalizer needs all experts -> compute from gathered logits
        logits_local = jnp.einsum(
            "btd,de->bte", x_rep, p["router"].astype(x_rep.dtype),
            preferred_element_type=jnp.float32)
        logits = jax.lax.all_gather(
            logits_local, expert_axis, axis=2, tiled=True)
        gate = jax.nn.softmax(logits, axis=-1)
        # this device's slice of the gate
        idx = jax.lax.axis_index(expert_axis)
        per = n_exp // n_dev
        gate_local = jax.lax.dynamic_slice_in_dim(
            gate, idx * per, per, axis=2)

        hid = jax.nn.gelu(
            ee("btd,edh->ebth", x_rep, p["w_in"].astype(x_rep.dtype)))
        y = ee("ebth,ehd->ebtd", hid, p["w_out"].astype(x_rep.dtype))
        part = jnp.einsum("ebtd,bte->btd", y,
                          gate_local.astype(y.dtype),
                          preferred_element_type=jnp.float32
                          ).astype(x_rep.dtype)
        return jax.lax.psum(part, expert_axis)

    return run(params, x)
