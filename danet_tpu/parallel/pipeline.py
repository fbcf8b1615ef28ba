"""Pipeline parallelism: GPipe-style microbatching over encoder layers.

SURVEY.md §2.4 marks PP "not warranted" for a 4-layer encoder, and the
trainer does not use it by default — but the capability exists here so the
framework scales if the encoder stack is deepened: the BiLSTM layers are
placed one-per-device along a 'pipe' mesh axis (each device holds ONLY its
layer's weights — the stacked layer pytree is sharded over the axis), the
batch is split into microbatches, and activations flow stage-to-stage over
the ICI via `ppermute` in a software-pipelined schedule of
``n_micro + n_stages - 1`` ticks (bubble fraction (S-1)/(M+S-1)).

Forward-only entry point (inference / feature extraction); the schedule is
pure lax ops, so JAX autodiff can differentiate through it when needed.
Layer 0's smaller input width is zero-padded up to the inter-stage width so
every stage runs the same program on identically-shaped params.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from danet_tpu.ops import rnn


def _pad_layer_params(p, in_dim: int):
    """Zero-pad a bilstm layer's input dim up to in_dim (homogeneous
    stacking across stages; zero rows contribute nothing)."""
    def pad_dir(d):
        wx = d["wx"]
        pad = in_dim - wx.shape[0]
        if pad:
            wx = jnp.pad(wx, [(0, pad), (0, 0), (0, 0)])
        return {"wx": wx, "wh": d["wh"], "b": d["b"]}
    return {"fwd": pad_dir(p["fwd"]), "bwd": pad_dir(p["bwd"])}


def stack_pipeline_params(params_list, mesh, pipe_axis: str = "pipe"):
    """One-time preparation: pad layer-0's input dim to the inter-stage
    width, stack the layer pytrees along a leading stage axis, and place
    the stack sharded over `pipe_axis` (each device then holds ONLY its
    layer's weights).  Reuse the result across calls."""
    hdim = params_list[0]["fwd"]["wh"].shape[0]
    width = 2 * hdim
    padded = [_pad_layer_params(p, width) for p in params_list]
    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *padded)          # [S, ...] per leaf
    shardings = jax.tree_util.tree_map(
        lambda v: jax.NamedSharding(mesh, P(pipe_axis)), stacked)
    return jax.device_put(stacked, shardings)


def bilstm_stack_pipelined(params_list, x, mesh, n_micro: int = 4,
                           pipe_axis: str = "pipe",
                           candidate_activation: str = "tanh",
                           backend: str = "xla", stacked=None):
    """Run a BiLSTM stack pipelined over `pipe_axis`.

    Args:
        params_list: one bilstm param dict per layer; len == axis size
        x: [B, T, F] with B divisible by n_micro
        mesh: Mesh containing `pipe_axis` with size == len(params_list)
        stacked: optional pre-stacked/sharded params from
            stack_pipeline_params (avoids re-staging per call)
    Returns:
        [B, T, 2*hdim]
    """
    s = mesh.shape[pipe_axis]
    assert len(params_list) == s, "one layer per pipeline stage"
    b, t, f = x.shape
    assert b % n_micro == 0
    mb = b // n_micro
    hdim = params_list[0]["fwd"]["wh"].shape[0]
    width = 2 * hdim  # inter-stage activation width
    assert width >= f, "inter-stage width must cover the input features"

    if stacked is None:
        stacked = stack_pipeline_params(params_list, mesh, pipe_axis)

    # microbatches, input features zero-padded to the inter-stage width
    x_mb = jnp.pad(x, [(0, 0), (0, 0), (0, width - f)])
    x_mb = x_mb.reshape(n_micro, mb, t, width)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(pipe_axis), P()),
        out_specs=P(pipe_axis))
    def run(stage_params, micro):
        # stage_params: this device's layer (leading stage axis of size 1)
        my_params = jax.tree_util.tree_map(lambda v: v[0], stage_params)
        stage = jax.lax.axis_index(pipe_axis)
        perm = [(i, i + 1) for i in range(s - 1)]

        def layer(z):
            return rnn.bilstm_apply(
                my_params, z, candidate_activation, backend=backend)

        n_ticks = n_micro + s - 1
        # loop carries must be marked pipe-varying under shard_map
        out_buf = jax.lax.pcast(
            jnp.zeros((n_micro, mb, t, width), x.dtype), pipe_axis,
            to="varying")
        carry = jax.lax.pcast(
            jnp.zeros((mb, t, width), x.dtype), pipe_axis, to="varying")

        def tick(i, state):
            carry, out_buf = state
            # stage 0 ingests microbatch i (garbage after the last one —
            # masked out by the collection index below)
            feed_idx = jnp.clip(i, 0, n_micro - 1)
            inp = jnp.where(stage == 0, micro[feed_idx], carry)
            out = layer(inp)
            # last stage completed microbatch i-(s-1) this tick
            done_idx = jnp.clip(i - (s - 1), 0, n_micro - 1)
            valid = jnp.logical_and(stage == s - 1, i >= s - 1)
            out_buf = jax.lax.cond(
                valid,
                lambda ob: ob.at[done_idx].set(out),
                lambda ob: ob,
                out_buf)
            carry = jax.lax.ppermute(out, pipe_axis, perm)
            return carry, out_buf

        _, out_buf = jax.lax.fori_loop(0, n_ticks, tick, (carry, out_buf))
        return out_buf[None]  # [1, M, mb, T, width] -> stage axis

    out = run(stacked, x_mb)                        # [S, M, mb, T, width]
    return out[-1].reshape(b, t, width)
