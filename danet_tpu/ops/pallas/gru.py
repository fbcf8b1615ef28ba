"""Pallas TPU kernel: full GRU time loop with VMEM-resident weights.

Same design as ops/pallas/lstm.py (see that module's header for the
rationale): the XLA `lax.scan` path re-streams the recurrent matrices
Wgh (H x 2H) and Wch (H x H) from HBM every timestep; here the entire T
loop runs inside one `pallas_call` with both matrices pinned in VMEM
(constant index_map), the state carried in f32 VMEM scratch, and UNROLL
timesteps per grid step.

Cell semantics match ops/rnn.py::gru_apply exactly (reference
app/ops.py:151-188): gates (r, u) = sigmoid(gx_t + c @ Wgh); candidate
= tanh(cx_t + (c*r) @ Wch); c' = c*u + cand*(1-u).  Unlike the LSTM the
GRU state *is* the output, so there is a single carried tensor.

`jax.custom_vjp` selects a lean forward (inference: only the state
sequence is written to HBM) or a residual-saving forward (training: also
stores [r|u|cand] activations); the backward kernel replays the loop in
reverse with f32 VMEM accumulators for dWgh/dWch.  All gate math is f32
regardless of storage dtype (bf16-safe).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from danet_tpu.ops.pallas.lstm import (_const_spec, _pick_unroll, _seq_spec,
                                       _seq_spec_rev)


def _gru_step(gx_t, cx_t, c, wgh, wch, hdim: int):
    """One GRU step in f32: returns (c_new_f32, acts_f32 = [r|u|cand])."""
    dt = gx_t.dtype
    c_dt = c.astype(dt)
    gact = (gx_t.astype(jnp.float32)
            + jnp.dot(c_dt, wgh, preferred_element_type=jnp.float32))
    r = jax.nn.sigmoid(gact[:, :hdim])
    u = jax.nn.sigmoid(gact[:, hdim:])
    cr = (c * r).astype(dt)
    cand = jnp.tanh(cx_t.astype(jnp.float32)
                    + jnp.dot(cr, wch, preferred_element_type=jnp.float32))
    c_new = c * u + cand * (1.0 - u)
    acts = jnp.concatenate([r, u, cand], axis=-1)
    return c_new, acts


def _gru_bwd_step(acts, c_prev, dc_total, wgh, wch, hdim: int, dt):
    """Backward of one step (f32 math): returns
    (dgx_f32, dcx_f32, dwgh_inc_f32, dwch_inc_f32, dc_prev_f32)."""
    r, u = acts[:, :hdim], acts[:, hdim:2 * hdim]
    cand = acts[:, 2 * hdim:]
    # c' = c_prev*u + cand*(1-u)
    du_pre = dc_total * (c_prev - cand) * u * (1.0 - u)
    dcand_pre = dc_total * (1.0 - u) * (1.0 - cand * cand)
    dc_prev = dc_total * u
    # cand_pre = cx_t + (c_prev*r) @ Wch
    dcand_dt = dcand_pre.astype(dt)
    dcr = jax.lax.dot_general(dcand_dt, wch, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dc_prev = dc_prev + dcr * r
    dr_pre = dcr * c_prev * r * (1.0 - r)
    dgx = jnp.concatenate([dr_pre, du_pre], axis=-1)
    dgx_dt = dgx.astype(dt)
    dc_prev = dc_prev + jax.lax.dot_general(
        dgx_dt, wgh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dgx, dcand_pre, dc_prev


def _fwd_kernel(gx_ref, cx_ref, wgh_ref, wch_ref, c0_ref, *rest,
                unroll: int, save: bool):
    if save:
        cs_ref, acts_ref, c_scr = rest
    else:
        cs_ref, c_scr = rest
    blk = pl.program_id(0)
    hdim = c_scr.shape[-1]
    dt = gx_ref.dtype

    @pl.when(blk == 0)
    def _():
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    c = c_scr[:]
    for s in range(unroll):
        c, acts = _gru_step(gx_ref[s], cx_ref[s], c, wgh_ref[:], wch_ref[:],
                            hdim)
        cs_ref[s] = c.astype(dt)
        if save:
            acts_ref[s] = acts.astype(dt)
    c_scr[:] = c


def _bwd_kernel(d_cs_ref, acts_ref, cprev_ref, wgh_ref, wch_ref,
                dgx_ref, dcx_ref, dc0_ref,
                dc_scr, *, unroll: int):
    """Backward scan: sequential work only (dgx/dcx/dc chain).

    As in the LSTM backward (ops/pallas/lstm.py::_bwd_kernel), the weight
    gradients are NOT accumulated in-kernel: their per-step contributions
    are rank-B GEMMs with no sequential dependency, so _vjp_bwd computes
    dWgh/dWch as bulk [H, T*B] x [T*B, .] GEMMs at near-peak MXU
    utilization from the dgx/dcx streams this kernel writes out."""
    blk = pl.program_id(0)
    hdim = dc_scr.shape[-1]
    dt = d_cs_ref.dtype

    @pl.when(blk == 0)
    def _():
        dc_scr[:] = jnp.zeros_like(dc_scr)

    dc = dc_scr[:]
    for s in range(unroll - 1, -1, -1):
        dc_total = d_cs_ref[s].astype(jnp.float32) + dc
        dgx, dcx, dc = _gru_bwd_step(
            acts_ref[s].astype(jnp.float32),
            cprev_ref[s].astype(jnp.float32),
            dc_total, wgh_ref[:], wch_ref[:], hdim, dt)
        dgx_ref[s] = dgx.astype(dt)
        dcx_ref[s] = dcx.astype(dt)
    dc_scr[:] = dc

    n_blk = pl.num_programs(0)

    @pl.when(blk == n_blk - 1)
    def _():
        dc0_ref[:] = dc_scr[:].astype(dt)


def _fwd_call(gx, cx, wgh, wch, c0, interpret, save):
    t, b = gx.shape[0], gx.shape[1]
    g2 = gx.shape[2]
    h = g2 // 2
    dt = gx.dtype
    u = _pick_unroll(t)
    seq = functools.partial(_seq_spec, u, 1)
    out_specs = [seq(b, h)]
    out_shape = [jax.ShapeDtypeStruct((t, b, h), dt)]
    if save:
        out_specs.append(seq(b, 3 * h))
        out_shape.append(jax.ShapeDtypeStruct((t, b, 3 * h), dt))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, unroll=u, save=save),
        grid=(t // u,),
        in_specs=[
            seq(b, g2), seq(b, h),
            _const_spec(h, g2), _const_spec(h, h), _const_spec(b, h),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        interpret=interpret,
    )(gx, cx, wgh, wch, c0)


_fwd_call_jit = jax.jit(_fwd_call, static_argnames=("interpret", "save"))


def _bwd_call(d_cs, acts, c_prev, wgh, wch, interpret):
    t, b = d_cs.shape[0], d_cs.shape[1]
    h = d_cs.shape[2]
    dt = d_cs.dtype
    u = _pick_unroll(t)
    n_blk = t // u
    rev = functools.partial(_seq_spec_rev, u, n_blk, 1)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, unroll=u),
        grid=(n_blk,),
        in_specs=[
            rev(b, h), rev(b, 3 * h), rev(b, h),
            _const_spec(h, 2 * h), _const_spec(h, h),
        ],
        out_specs=[
            rev(b, 2 * h), rev(b, h), _const_spec(b, h),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, 2 * h), dt),
            jax.ShapeDtypeStruct((t, b, h), dt),
            jax.ShapeDtypeStruct((b, h), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
        ],
        interpret=interpret,
    )(d_cs, acts, c_prev, wgh, wch)


_bwd_call_jit = jax.jit(_bwd_call, static_argnames=("interpret",))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_scan_pallas(gx, cx, wgh, wch, c0, interpret: bool = False):
    """GRU over precomputed projections.

    Args:
        gx: [T, B, 2H] gate projections + bias (r|u layout)
        cx: [T, B, H] candidate projections + bias
        wgh: [H, 2H] recurrent gate weights; wch: [H, H] candidate weights
        c0: [B, H] initial state
    Returns:
        cs: [T, B, H] state sequence (the GRU's output)
    """
    (cs,) = _fwd_call_jit(gx, cx, wgh, wch, c0, interpret, False)
    return cs


def _vjp_fwd(gx, cx, wgh, wch, c0, interpret):
    cs, acts = _fwd_call_jit(gx, cx, wgh, wch, c0, interpret, True)
    return cs, (wgh, wch, c0, cs, acts)


def _vjp_bwd(interpret, res, d_cs):
    wgh, wch, c0, cs, acts = res
    c_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    dgx, dcx, dc0 = _bwd_call_jit(
        d_cs, acts, c_prev, wgh, wch, interpret)
    # weight grads as bulk GEMMs over all timesteps (see _bwd_kernel)
    h = c_prev.shape[-1]
    r = acts[..., :h]
    dwgh = jnp.einsum("tbh,tbg->hg", c_prev, dgx,
                      preferred_element_type=jnp.float32)
    dwch = jnp.einsum("tbh,tbk->hk", c_prev * r, dcx,
                      preferred_element_type=jnp.float32)
    return dgx, dcx, dwgh.astype(wgh.dtype), dwch.astype(wch.dtype), dc0


gru_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)
