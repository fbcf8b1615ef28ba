"""Pallas TPU kernel: full LSTM time loop with VMEM-resident weights.

The XLA `lax.scan` path (ops/rnn.py) re-streams the recurrent weight matrix
Wh (H x 4H) from HBM on every timestep and pays while-loop overhead per
step; for DaNet's BiLSTM stack that is 8 scans x T steps of tiny
[B,H]x[H,4H] matmuls — latency-bound, not FLOP-bound.  These kernels run
the *entire* T loop inside one `pallas_call`: Wh is loaded into VMEM once
(constant index_map -> no per-step DMA), the cell/hidden state lives in
VMEM scratch across grid steps, and each grid step processes a block of
UNROLL timesteps (one xp-block DMA in, one hs-block write out) so
per-grid-step pipeline overhead is amortized.

Variants:
  * unidirectional (`lstm_scan_pallas`) and fused bidirectional
    (`bilstm_scan_pallas`, both directions of a BiLSTM layer in one kernel
    — the shipping path, halving sequential kernel loops per layer);
  * each has a *lean* forward (inference: only the hidden sequence is
    written to HBM) and a *training* forward (also stores gates + cell
    states as VJP residuals), selected automatically by `jax.custom_vjp`
    (autodiff calls the residual-saving variant, plain calls the lean one).

The backward kernels replay the loop in reverse (reversed block index
maps, reversed inner loop), accumulating dWh in a VMEM f32 scratch with
the same weight-residency property.  All gate math runs in f32 regardless
of the storage dtype (bf16-safe; the MXU accumulates f32 natively); the
cell state is carried in f32.

Cell semantics match ops/rnn.py exactly ([cand|i|f|o] gate layout,
optional no-tanh candidate for reference parity — ops.py:110-148); the
per-step math lives in the shared `_cell_step` / `_cell_bwd_step` helpers
so all kernels compute identical values.
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


# ---------------------------------------------------------------------------
# shared per-step cell math (single source of truth for all kernels)
# ---------------------------------------------------------------------------

def _cell_step(xp_t, h, c, wh, hdim: int, tanh_cand: bool):
    """One LSTM step in f32: returns (c_new_f32, h_new_f32, acts_f32).

    acts = concat[g(cand), sig(i), sig(f), sig(o)] — the VJP residuals.
    """
    act = (xp_t.astype(jnp.float32)
           + jnp.dot(h, wh, preferred_element_type=jnp.float32))
    cand = act[:, :hdim]
    if tanh_cand:
        cand = jnp.tanh(cand)
    i = jax.nn.sigmoid(act[:, hdim:2 * hdim])
    f = jax.nn.sigmoid(act[:, 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(act[:, 3 * hdim:])
    c_new = i * cand + f * c
    h_new = o * jnp.tanh(c_new)
    acts = jnp.concatenate([cand, i, f, o], axis=-1)
    return c_new, h_new, acts


def _cell_bwd_step(acts, c_t, c_prev, dh_total, dc, hdim: int,
                   tanh_cand: bool):
    """Backward of one step (all f32): returns (dact_f32, dc_prev_f32)."""
    cand, i = acts[:, :hdim], acts[:, hdim:2 * hdim]
    f, o = acts[:, 2 * hdim:3 * hdim], acts[:, 3 * hdim:]
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
    dact = jnp.concatenate([dcand_pre, di_pre, df_pre, do_pre], axis=-1)
    return dact, dc * f


# ---------------------------------------------------------------------------
# kernels (uni- and bidirectional x lean/training forward + backward)
# ---------------------------------------------------------------------------

def _fwd_kernel(xp_ref, wh_ref, c0_ref, h0_ref, *rest,
                tanh_cand: bool, unroll: int, n_dirs: int, save: bool):
    """Forward kernel, unified over direction count and residual saving.

    n_dirs=1: blocks have no direction axis; n_dirs=2: a leading dir axis.
    save=True additionally writes cs/acts (VJP residuals) to HBM.
    """
    if save:
        hs_ref, cs_ref, acts_ref, c_scr, h_scr = rest
    else:
        hs_ref, c_scr, h_scr = rest
    blk = pl.program_id(0)
    hdim = c_scr.shape[-1]
    dt = xp_ref.dtype

    @pl.when(blk == 0)
    def _():
        c_scr[:] = c0_ref[:].astype(jnp.float32)
        h_scr[:] = h0_ref[:]

    for d in range(n_dirs):
        ix = (lambda u: (u, d)) if n_dirs == 2 else (lambda u: u)
        wh = wh_ref[d] if n_dirs == 2 else wh_ref[:]
        c = c_scr[d] if n_dirs == 2 else c_scr[:]
        h = h_scr[d] if n_dirs == 2 else h_scr[:]
        for u in range(unroll):
            c, h_f32, acts = _cell_step(
                xp_ref[ix(u)], h, c, wh, hdim, tanh_cand)
            h = h_f32.astype(dt)
            hs_ref[ix(u)] = h
            if save:
                cs_ref[ix(u)] = c.astype(dt)
                acts_ref[ix(u)] = acts.astype(dt)
        if n_dirs == 2:
            c_scr[d] = c
            h_scr[d] = h
        else:
            c_scr[:] = c
            h_scr[:] = h


def _bwd_kernel(d_hs_ref, acts_ref, cs_ref, cprev_ref, wh_ref,
                dxp_ref, dc0_ref, dh0_ref,
                dc_scr, dh_scr, *, tanh_cand: bool, unroll: int,
                n_dirs: int):
    """Backward scan: only the truly sequential work stays in-kernel.

    Per step this computes dact (written out as dxp) and the dh/dc chains.
    The weight gradient dWh = sum_t h_{t-1}^T dact_t is NOT accumulated
    here: each per-step contribution is a rank-B GEMM (contraction = batch
    = 32) that badly underfills the 128-deep MXU contraction — it has no
    sequential dependency, so the caller computes it as ONE bulk
    [H, T*B] x [T*B, 4H] GEMM at near-peak utilization instead
    (vjp_bwd below).  Same operands, bit-equivalent modulo f32 reduction
    order; measured ~15% off the flagship fwd+bwd layer time.
    """
    blk = pl.program_id(0)        # block index; index maps reverse it
    n_blk = pl.num_programs(0)
    hdim = dc_scr.shape[-1]
    dt = d_hs_ref.dtype

    @pl.when(blk == 0)
    def _():
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dh_scr[:] = jnp.zeros_like(dh_scr)

    for d in range(n_dirs):
        ix = (lambda u: (u, d)) if n_dirs == 2 else (lambda u: u)
        wh = wh_ref[d] if n_dirs == 2 else wh_ref[:]
        dc = dc_scr[d] if n_dirs == 2 else dc_scr[:]
        dh_carry = dh_scr[d] if n_dirs == 2 else dh_scr[:]
        for u in range(unroll - 1, -1, -1):
            dh_total = d_hs_ref[ix(u)].astype(jnp.float32) + dh_carry
            dact, dc = _cell_bwd_step(
                acts_ref[ix(u)].astype(jnp.float32),
                cs_ref[ix(u)].astype(jnp.float32),
                cprev_ref[ix(u)].astype(jnp.float32),
                dh_total, dc, hdim, tanh_cand)
            dact_dt = dact.astype(dt)
            dxp_ref[ix(u)] = dact_dt
            # dh_{t-1} = dact @ Wh^T
            dh_carry = jax.lax.dot_general(
                dact_dt, wh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        if n_dirs == 2:
            dc_scr[d] = dc
            dh_scr[d] = dh_carry
        else:
            dc_scr[:] = dc
            dh_scr[:] = dh_carry

    @pl.when(blk == n_blk - 1)
    def _():
        dc0_ref[:] = dc_scr[:].astype(dt)
        dh0_ref[:] = dh_scr[:].astype(dt)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _dir_shape(n_dirs, *tail):
    return tail if n_dirs == 1 else (n_dirs,) + tail


def _seq_spec(u, n_dirs, *tail):
    shape = (u,) + _dir_shape(n_dirs, *tail)
    pad = (0,) * (len(shape) - 1)
    return pl.BlockSpec(shape, lambda i: (i,) + pad,
                        memory_space=pltpu.VMEM)


def _seq_spec_rev(u, n_blk, n_dirs, *tail):
    shape = (u,) + _dir_shape(n_dirs, *tail)
    pad = (0,) * (len(shape) - 1)
    return pl.BlockSpec(shape, lambda i: (n_blk - 1 - i,) + pad,
                        memory_space=pltpu.VMEM)


def _const_spec(*shape):
    pad = (0,) * len(shape)
    return pl.BlockSpec(shape, lambda i: pad, memory_space=pltpu.VMEM)


def _fwd_call(xp, wh, c0, h0, tanh_cand, interpret, n_dirs, save):
    t = xp.shape[0]
    b, g4 = xp.shape[-2], xp.shape[-1]
    h = g4 // 4
    dt = xp.dtype
    u = _pick_unroll(t)
    seq = functools.partial(_seq_spec, u, n_dirs)
    out_specs = [seq(b, h)]
    out_shape = [jax.ShapeDtypeStruct((t,) + _dir_shape(n_dirs, b, h), dt)]
    if save:
        out_specs += [seq(b, h), seq(b, g4)]
        out_shape += [
            jax.ShapeDtypeStruct((t,) + _dir_shape(n_dirs, b, h), dt),
            jax.ShapeDtypeStruct((t,) + _dir_shape(n_dirs, b, g4), dt),
        ]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tanh_cand=tanh_cand, unroll=u,
                          n_dirs=n_dirs, save=save),
        grid=(t // u,),
        in_specs=[
            seq(b, g4),
            _const_spec(*_dir_shape(n_dirs, h, g4)),
            _const_spec(*_dir_shape(n_dirs, b, h)),
            _const_spec(*_dir_shape(n_dirs, b, h)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM(_dir_shape(n_dirs, b, h), jnp.float32),
            pltpu.VMEM(_dir_shape(n_dirs, b, h), dt),
        ],
        interpret=interpret,
    )(xp, wh, c0, h0)


_fwd_call_jit = jax.jit(
    _fwd_call, static_argnames=("tanh_cand", "interpret", "n_dirs", "save"))


def _bwd_call(d_hs, acts, cs, c_prev, wh, tanh_cand, interpret,
              n_dirs):
    t = acts.shape[0]
    b, g4 = acts.shape[-2], acts.shape[-1]
    h = g4 // 4
    dt = d_hs.dtype
    u = _pick_unroll(t)
    n_blk = t // u
    rev = functools.partial(_seq_spec_rev, u, n_blk, n_dirs)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tanh_cand=tanh_cand, unroll=u,
                          n_dirs=n_dirs),
        grid=(n_blk,),
        in_specs=[
            rev(b, h), rev(b, g4), rev(b, h), rev(b, h),
            _const_spec(*_dir_shape(n_dirs, h, g4)),
        ],
        out_specs=[
            rev(b, g4),
            _const_spec(*_dir_shape(n_dirs, b, h)),
            _const_spec(*_dir_shape(n_dirs, b, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t,) + _dir_shape(n_dirs, b, g4), dt),
            jax.ShapeDtypeStruct(_dir_shape(n_dirs, b, h), dt),
            jax.ShapeDtypeStruct(_dir_shape(n_dirs, b, h), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM(_dir_shape(n_dirs, b, h), jnp.float32),
            pltpu.VMEM(_dir_shape(n_dirs, b, h), jnp.float32),
        ],
        interpret=interpret,
    )(d_hs, acts, cs, c_prev, wh)


_bwd_call_jit = jax.jit(
    _bwd_call, static_argnames=("tanh_cand", "interpret", "n_dirs"))


# ---------------------------------------------------------------------------
# custom-VJP entry points
# ---------------------------------------------------------------------------

def _make_scan(n_dirs: int, doc: str):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
    def scan(xp, wh, c0, h0, tanh_cand: bool = True,
             interpret: bool = False):
        # primal (inference) path: lean kernel, no residual writes
        (hs,) = _fwd_call_jit(xp, wh, c0, h0, tanh_cand, interpret,
                              n_dirs, False)
        return hs

    def vjp_fwd(xp, wh, c0, h0, tanh_cand, interpret):
        hs, cs, acts = _fwd_call_jit(xp, wh, c0, h0, tanh_cand, interpret,
                                     n_dirs, True)
        return hs, (wh, c0, h0, hs, cs, acts)

    def vjp_bwd(tanh_cand, interpret, res, d_hs):
        wh, c0, h0, hs, cs, acts = res
        c_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
        h_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
        dxp, dc0, dh0 = _bwd_call_jit(
            d_hs, acts, cs, c_prev, wh, tanh_cand, interpret, n_dirs)
        # dWh as ONE bulk GEMM over all timesteps (contraction T*B) —
        # see _bwd_kernel docstring; dxp holds the per-step dact values.
        eq = "tbh,tbg->hg" if n_dirs == 1 else "tdbh,tdbg->dhg"
        dwh = jnp.einsum(eq, h_prev, dxp,
                         preferred_element_type=jnp.float32)
        return dxp, dwh.astype(wh.dtype), dc0, dh0

    scan.defvjp(vjp_fwd, vjp_bwd)
    scan.__doc__ = doc
    return scan


lstm_scan_pallas = _make_scan(1, """LSTM over precomputed input projections.

Args:
    xp: [T, B, 4H] input projections + bias (cand|i|f|o layout)
    wh: [H, 4H] recurrent weights
    c0, h0: [B, H] initial state
Returns:
    hs: [T, B, H] hidden sequence
""")

bilstm_scan_pallas = _make_scan(2, """Fused bidirectional LSTM scan.

Args:
    xp: [T, 2, B, 4H] — dir 0: forward projections in time order; dir 1:
        backward-direction projections of the TIME-REVERSED input (the
        caller reverses in/out)
    wh: [2, H, 4H]; c0/h0: [2, B, H]
Returns:
    hs: [T, 2, B, H]
""")
