"""Pallas TPU kernel: full LSTM time loop with VMEM-resident weights.

The XLA `lax.scan` path (ops/rnn.py) re-streams the recurrent weight matrix
Wh (H x 4H) from HBM on every timestep and pays while-loop overhead per
step; for DaNet's BiLSTM stack that is 8 scans x T steps of tiny
[B,H]x[H,4H] matmuls — latency-bound, not FLOP-bound (measured: bf16 only
buys 18% on the XLA path).  This kernel runs the *entire* T loop inside one
`pallas_call`: Wh is loaded into VMEM once (constant index_map -> no
per-step DMA), the cell/hidden state lives in VMEM scratch across grid
steps, and each grid step processes a *block of UNROLL timesteps* (one
xp-block DMA in, one hs-block write out, UNROLL MXU dots + fused VPU gate
math inside) so the per-grid-step pipeline overhead is amortized.

Training support via `jax.custom_vjp`: the forward kernel stores
post-activation gates and cell states; the backward kernel replays the
loop in reverse (reversed block index maps, reversed inner loop),
accumulating dWh in a VMEM f32 scratch and emitting per-step dXp, with the
same weight-residency property.

All gate math runs in f32 regardless of the storage dtype (bf16-safe; the
MXU accumulates f32 natively); the cell state is carried in f32.

Cell semantics match ops/rnn.py exactly ([cand|i|f|o] gate layout,
optional no-tanh candidate for reference parity — ops.py:110-148).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_unroll(t: int) -> int:
    """Timesteps per grid step.  Measured on v5e (flagship train step):
    U=1 5267, U=4 5463, U=8 4597 mixtures/sec — 4 balances grid-overhead
    amortization against DMA/compute overlap.  DANET_LSTM_UNROLL overrides
    for experiments."""
    import os
    pref = int(os.environ.get("DANET_LSTM_UNROLL", "0") or 0)
    order = (pref,) if pref else (4, 2)
    for u in order:
        if u > 0 and t % u == 0:
            return u
    return 1


def _gates(act, hdim: int, tanh_cand: bool):
    cand = act[:, :hdim]
    if tanh_cand:
        cand = jnp.tanh(cand)
    i = jax.nn.sigmoid(act[:, hdim:2 * hdim])
    f = jax.nn.sigmoid(act[:, 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(act[:, 3 * hdim:])
    return cand, i, f, o


def _fwd_kernel(xp_ref, wh_ref, c0_ref, h0_ref,
                hs_ref, cs_ref, acts_ref,
                c_scr, h_scr, *, tanh_cand: bool, unroll: int):
    blk = pl.program_id(0)
    hdim = c_scr.shape[-1]
    dt = xp_ref.dtype

    @pl.when(blk == 0)
    def _():
        c_scr[:] = c0_ref[:].astype(jnp.float32)
        h_scr[:] = h0_ref[:]

    c = c_scr[:]
    h = h_scr[:]
    for u in range(unroll):
        act = (xp_ref[u].astype(jnp.float32)
               + jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32))
        cand, i, f, o = _gates(act, hdim, tanh_cand)
        c = i * cand + f * c
        h_f32 = o * jnp.tanh(c)
        h = h_f32.astype(dt)
        acts_ref[u] = jnp.concatenate([cand, i, f, o], axis=-1).astype(dt)
        cs_ref[u] = c.astype(dt)
        hs_ref[u] = h
    c_scr[:] = c
    h_scr[:] = h


def _bwd_kernel(d_hs_ref, acts_ref, cs_ref, cprev_ref, hprev_ref, wh_ref,
                dxp_ref, dwh_ref, dc0_ref, dh0_ref,
                dc_scr, dh_scr, dwh_scr, *, tanh_cand: bool, unroll: int):
    blk = pl.program_id(0)        # block index; index maps reverse it
    n_blk = pl.num_programs(0)
    hdim = dc_scr.shape[-1]
    dt = d_hs_ref.dtype

    @pl.when(blk == 0)
    def _():
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    dc = dc_scr[:]
    dh_carry = dh_scr[:]
    dwh = dwh_scr[:]
    for u in range(unroll - 1, -1, -1):
        acts = acts_ref[u].astype(jnp.float32)
        cand, i = acts[:, :hdim], acts[:, hdim:2 * hdim]
        f, o = acts[:, 2 * hdim:3 * hdim], acts[:, 3 * hdim:]
        c_t = cs_ref[u].astype(jnp.float32)
        c_prev = cprev_ref[u].astype(jnp.float32)

        dh_total = d_hs_ref[u].astype(jnp.float32) + dh_carry
        tanh_c = jnp.tanh(c_t)
        do_pre = dh_total * tanh_c * o * (1.0 - o)
        dc = dc + dh_total * o * (1.0 - tanh_c * tanh_c)
        dcand = dc * i
        if tanh_cand:
            dcand_pre = dcand * (1.0 - cand * cand)
        else:
            dcand_pre = dcand
        di_pre = dc * cand * i * (1.0 - i)
        df_pre = dc * c_prev * f * (1.0 - f)
        dact = jnp.concatenate(
            [dcand_pre, di_pre, df_pre, do_pre], axis=-1)
        dact_dt = dact.astype(dt)

        dxp_ref[u] = dact_dt
        dc = dc * f
        # dh_{t-1} = dact @ Wh^T
        dh_carry = jax.lax.dot_general(
            dact_dt, wh_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dWh += h_{t-1}^T @ dact  (f32 accumulator in VMEM)
        dwh = dwh + jax.lax.dot_general(
            hprev_ref[u], dact_dt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dc_scr[:] = dc
    dh_scr[:] = dh_carry
    dwh_scr[:] = dwh

    @pl.when(blk == n_blk - 1)
    def _():
        dwh_ref[:] = dwh
        dc0_ref[:] = dc.astype(dt)
        dh0_ref[:] = dh_carry.astype(dt)


@functools.partial(jax.jit, static_argnames=("tanh_cand", "interpret"))
def _lstm_fwd_call(xp, wh, c0, h0, tanh_cand: bool, interpret: bool):
    t, b, g4 = xp.shape
    h = g4 // 4
    dt = xp.dtype
    u = _pick_unroll(t)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tanh_cand=tanh_cand, unroll=u),
        grid=(t // u,),
        in_specs=[
            pl.BlockSpec((u, b, g4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((u, b, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b, g4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, h), dt),    # hs
            jax.ShapeDtypeStruct((t, b, h), dt),    # cs
            jax.ShapeDtypeStruct((t, b, g4), dt),   # post-activation gates
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),  # cell state carried in f32
            pltpu.VMEM((b, h), dt),
        ],
        interpret=interpret,
    )(xp, wh, c0, h0)


@functools.partial(jax.jit, static_argnames=("tanh_cand", "interpret"))
def _lstm_bwd_call(d_hs, acts, cs, c_prev, h_prev, wh,
                   tanh_cand: bool, interpret: bool):
    t, b, g4 = acts.shape
    h = g4 // 4
    dt = d_hs.dtype
    u = _pick_unroll(t)
    n_blk = t // u
    rev = lambda i: (n_blk - 1 - i, 0, 0)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tanh_cand=tanh_cand, unroll=u),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((u, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b, g4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((u, b, g4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, g4), dt),          # dxp
            jax.ShapeDtypeStruct((h, g4), jnp.float32),    # dwh
            jax.ShapeDtypeStruct((b, h), dt),              # dc0
            jax.ShapeDtypeStruct((b, h), dt),              # dh0
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((h, g4), jnp.float32),
        ],
        interpret=interpret,
    )(d_hs, acts, cs, c_prev, h_prev, wh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lstm_scan_pallas(xp, wh, c0, h0, tanh_cand: bool = True,
                     interpret: bool = False):
    """LSTM over precomputed input projections.

    Args:
        xp: [T, B, 4H] input projections + bias (cand|i|f|o layout)
        wh: [H, 4H] recurrent weights
        c0, h0: [B, H] initial state
    Returns:
        hs: [T, B, H] hidden sequence
    """
    hs, _, _ = _lstm_fwd_call(xp, wh, c0, h0, tanh_cand, interpret)
    return hs


def _vjp_fwd(xp, wh, c0, h0, tanh_cand, interpret):
    hs, cs, acts = _lstm_fwd_call(xp, wh, c0, h0, tanh_cand, interpret)
    return hs, (xp, wh, c0, h0, hs, cs, acts)


def _vjp_bwd(tanh_cand, interpret, res, d_hs):
    xp, wh, c0, h0, hs, cs, acts = res
    c_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    h_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    dxp, dwh, dc0, dh0 = _lstm_bwd_call(
        d_hs, acts, cs, c_prev, h_prev, wh, tanh_cand, interpret)
    return dxp, dwh.astype(wh.dtype), dc0, dh0


lstm_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Fused bidirectional variant: both directions of a BiLSTM layer run inside
# ONE pallas_call (separate Wh per direction, both VMEM-resident; the
# backward direction's inputs/outputs are pre/post-reversed by the caller),
# halving the number of sequential kernel loops per layer.
# ---------------------------------------------------------------------------

def _fwd_kernel_bidi(xp_ref, wh_ref, c0_ref, h0_ref,
                     hs_ref, cs_ref, acts_ref,
                     c_scr, h_scr, *, tanh_cand: bool, unroll: int):
    blk = pl.program_id(0)
    hdim = c_scr.shape[-1]
    dt = xp_ref.dtype

    @pl.when(blk == 0)
    def _():
        c_scr[:] = c0_ref[:].astype(jnp.float32)
        h_scr[:] = h0_ref[:]

    for d in range(2):
        c = c_scr[d]
        h = h_scr[d]
        for u in range(unroll):
            act = (xp_ref[u, d].astype(jnp.float32)
                   + jnp.dot(h, wh_ref[d],
                             preferred_element_type=jnp.float32))
            cand, i, f, o = _gates(act, hdim, tanh_cand)
            c = i * cand + f * c
            h = (o * jnp.tanh(c)).astype(dt)
            acts_ref[u, d] = jnp.concatenate(
                [cand, i, f, o], axis=-1).astype(dt)
            cs_ref[u, d] = c.astype(dt)
            hs_ref[u, d] = h
        c_scr[d] = c
        h_scr[d] = h


def _bwd_kernel_bidi(d_hs_ref, acts_ref, cs_ref, cprev_ref, hprev_ref,
                     wh_ref, dxp_ref, dwh_ref, dc0_ref, dh0_ref,
                     dc_scr, dh_scr, dwh_scr, *, tanh_cand: bool,
                     unroll: int):
    blk = pl.program_id(0)
    n_blk = pl.num_programs(0)
    hdim = dc_scr.shape[-1]
    dt = d_hs_ref.dtype

    @pl.when(blk == 0)
    def _():
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    for d in range(2):
        dc = dc_scr[d]
        dh_carry = dh_scr[d]
        dwh = dwh_scr[d]
        for u in range(unroll - 1, -1, -1):
            acts = acts_ref[u, d].astype(jnp.float32)
            cand, i = acts[:, :hdim], acts[:, hdim:2 * hdim]
            f, o = acts[:, 2 * hdim:3 * hdim], acts[:, 3 * hdim:]
            c_t = cs_ref[u, d].astype(jnp.float32)
            c_prev = cprev_ref[u, d].astype(jnp.float32)

            dh_total = d_hs_ref[u, d].astype(jnp.float32) + dh_carry
            tanh_c = jnp.tanh(c_t)
            do_pre = dh_total * tanh_c * o * (1.0 - o)
            dc = dc + dh_total * o * (1.0 - tanh_c * tanh_c)
            dcand = dc * i
            dcand_pre = dcand * (1.0 - cand * cand) if tanh_cand else dcand
            di_pre = dc * cand * i * (1.0 - i)
            df_pre = dc * c_prev * f * (1.0 - f)
            dact = jnp.concatenate(
                [dcand_pre, di_pre, df_pre, do_pre], axis=-1)
            dact_dt = dact.astype(dt)

            dxp_ref[u, d] = dact_dt
            dc = dc * f
            dh_carry = jax.lax.dot_general(
                dact_dt, wh_ref[d], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwh = dwh + jax.lax.dot_general(
                hprev_ref[u, d], dact_dt, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dc_scr[d] = dc
        dh_scr[d] = dh_carry
        dwh_scr[d] = dwh

    @pl.when(blk == n_blk - 1)
    def _():
        dwh_ref[:] = dwh_scr[:]
        dc0_ref[:] = dc_scr[:].astype(dt)
        dh0_ref[:] = dh_scr[:].astype(dt)


@functools.partial(jax.jit, static_argnames=("tanh_cand", "interpret"))
def _bilstm_fwd_call(xp2, wh2, c02, h02, tanh_cand: bool, interpret: bool):
    t, two, b, g4 = xp2.shape
    h = g4 // 4
    dt = xp2.dtype
    u = _pick_unroll(t)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_bidi, tanh_cand=tanh_cand, unroll=u),
        grid=(t // u,),
        in_specs=[
            pl.BlockSpec((u, 2, b, g4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, g4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((u, 2, b, h), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 2, b, h), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 2, b, g4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, 2, b, h), dt),
            jax.ShapeDtypeStruct((t, 2, b, h), dt),
            jax.ShapeDtypeStruct((t, 2, b, g4), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.VMEM((2, b, h), dt),
        ],
        interpret=interpret,
    )(xp2, wh2, c02, h02)


@functools.partial(jax.jit, static_argnames=("tanh_cand", "interpret"))
def _bilstm_bwd_call(d_hs, acts, cs, c_prev, h_prev, wh2,
                     tanh_cand: bool, interpret: bool):
    t, two, b, g4 = acts.shape
    h = g4 // 4
    dt = d_hs.dtype
    u = _pick_unroll(t)
    n_blk = t // u
    rev = lambda i: (n_blk - 1 - i, 0, 0, 0)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_bidi, tanh_cand=tanh_cand, unroll=u),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((u, 2, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 2, b, g4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 2, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 2, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 2, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, g4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((u, 2, b, g4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, g4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, 2, b, g4), dt),
            jax.ShapeDtypeStruct((2, h, g4), jnp.float32),
            jax.ShapeDtypeStruct((2, b, h), dt),
            jax.ShapeDtypeStruct((2, b, h), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.VMEM((2, h, g4), jnp.float32),
        ],
        interpret=interpret,
    )(d_hs, acts, cs, c_prev, h_prev, wh2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def bilstm_scan_pallas(xp2, wh2, c02, h02, tanh_cand: bool = True,
                       interpret: bool = False):
    """Fused bidirectional LSTM scan.

    Args:
        xp2: [T, 2, B, 4H] — dir 0: forward projections in time order;
             dir 1: backward-direction projections of the TIME-REVERSED
             input (the caller reverses in/out)
        wh2: [2, H, 4H]; c02/h02: [2, B, H]
    Returns:
        hs2: [T, 2, B, H]
    """
    hs, _, _ = _bilstm_fwd_call(xp2, wh2, c02, h02, tanh_cand, interpret)
    return hs


def _bi_vjp_fwd(xp2, wh2, c02, h02, tanh_cand, interpret):
    hs, cs, acts = _bilstm_fwd_call(xp2, wh2, c02, h02, tanh_cand,
                                    interpret)
    return hs, (wh2, c02, h02, hs, cs, acts)


def _bi_vjp_bwd(tanh_cand, interpret, res, d_hs):
    wh2, c02, h02, hs, cs, acts = res
    c_prev = jnp.concatenate([c02[None], cs[:-1]], axis=0)
    h_prev = jnp.concatenate([h02[None], hs[:-1]], axis=0)
    dxp, dwh, dc0, dh0 = _bilstm_bwd_call(
        d_hs, acts, cs, c_prev, h_prev, wh2, tanh_cand, interpret)
    return dxp, dwh.astype(wh2.dtype), dc0, dh0


bilstm_scan_pallas.defvjp(_bi_vjp_fwd, _bi_vjp_bwd)
