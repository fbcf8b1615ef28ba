"""Sequence-parallel (Bi)LSTM: chunked scan with halo state warmup.

SURVEY.md §2.4/§5: the reference handles long sequences only by cropping;
true sequence parallelism for recurrences is blocked by the sequential
state chain.  The TPU-native answer implemented here is the *halo* scheme:
the T axis is sharded over a 'seq' mesh axis (each device owns one chunk),
and every device warms its LSTM state up on a halo of frames received from
its neighbour over the ICI (`jax.lax.ppermute`), then discards the halo
outputs.  The recurrence is exact within a chunk and approximate across
chunk boundaries with error decaying in the halo length (LSTM state has
finite memory); the pointwise front/back ends are exactly T-parallel.

Wall-clock per layer ~ (chunk + halo)/chunk / S of the sequential scan;
comms are two edge-slice ppermutes per layer riding the ICI.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from danet_tpu.ops import rnn


def _shift_from_left(x_edge, axis_name):
    """Every device receives its LEFT neighbour's edge slice (device 0
    receives zeros)."""
    s = jax.lax.psum(1, axis_name)
    perm = [(i, i + 1) for i in range(s - 1)]
    return jax.lax.ppermute(x_edge, axis_name, perm)


def _shift_from_right(x_edge, axis_name):
    """Every device receives its RIGHT neighbour's edge slice (device S-1
    receives zeros)."""
    s = jax.lax.psum(1, axis_name)
    perm = [(i + 1, i) for i in range(s - 1)]
    return jax.lax.ppermute(x_edge, axis_name, perm)


def _bilstm_layer_local(p, x_loc, halo: int, axis_name: str,
                        candidate_activation: str, backend: str):
    """One BiLSTM layer on a local chunk [B, C, F] with halo warmup."""
    left = _shift_from_left(x_loc[:, -halo:], axis_name)
    right = _shift_from_right(x_loc[:, :halo], axis_name)

    # initial states must be marked seq-varying for the scan carry to
    # type-check under shard_map
    hdim = p["fwd"]["wh"].shape[0]
    zero = jax.lax.pcast(
        jnp.zeros((x_loc.shape[0], hdim), x_loc.dtype), axis_name,
        to="varying")

    x_fwd = jnp.concatenate([left, x_loc], axis=1)
    h_f = rnn.lstm_apply(p["fwd"], x_fwd, candidate_activation,
                         backend=backend, c0=zero, h0=zero)[:, halo:]
    x_bwd = jnp.concatenate([x_loc, right], axis=1)
    h_b = rnn.lstm_apply(p["bwd"], x_bwd, candidate_activation,
                         reverse=True, backend=backend,
                         c0=zero, h0=zero)[:, :x_loc.shape[1]]
    return jnp.concatenate([h_f, h_b], axis=-1)


def bilstm_stack_sp(params_list, x, mesh, halo: int = 32,
                    seq_axis: str = "seq",
                    candidate_activation: str = "tanh",
                    backend: str = "auto"):
    """Run a stack of BiLSTM layers sequence-parallel over `seq_axis`.

    Args:
        params_list: list of bilstm param dicts ({'fwd':..., 'bwd':...})
        x: GLOBAL input [B, T, F]; T must divide by the seq axis size and
           each chunk must be >= halo
        mesh: jax.sharding.Mesh containing `seq_axis`
        halo: warmup frames exchanged per layer per direction
    Returns:
        [B, T, 2*hdim] (global, T-sharded internally)
    """
    s = mesh.shape[seq_axis]
    assert halo >= 1, "halo must be >= 1 (x[:, -halo:] with halo=0 would " \
        "select the whole chunk, not an empty one)"
    assert x.shape[1] % s == 0, "T must divide across the seq axis"
    assert x.shape[1] // s >= halo, "chunk must be >= halo"

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, seq_axis, None)),
        out_specs=P(None, seq_axis, None))
    def run(params_list, x_loc):
        y = x_loc
        for p in params_list:
            y = _bilstm_layer_local(
                p, y, halo, seq_axis, candidate_activation, backend)
        return y

    return run(params_list, x)
