"""Recurrent layers as time-major ``lax.scan`` with fused gate GEMMs.

TPU-first redesign of the reference's RNN stack (tf.scan over a per-step
"flat" cell — /root/reference/main.py:76-183, app/ops.py:110-188):

  * **Input projections are hoisted out of the scan.**  The x-part of the
    gate pre-activation for *all* timesteps is one big
    ``[T*B, idim] @ [idim, 4*hdim]`` GEMM that XLA tiles onto the MXU; only
    the unavoidable recurrent ``h @ Wh`` stays inside the scan.
  * **Time-major layout** ([T, B, H]) so each scan step is a contiguous
    matmul, and weights stay resident across steps.
  * **Gate weights are stored as [in, 4, h]** so each of the four gates is
    contiguous in the trailing (lane) axis — this lets tensor-parallel
    sharding split the *hidden* axis while keeping all gate elementwise math
    local to a shard.

Cell semantics match reference ops.py:110-148: pre-activation split into
[candidate, i, f, o]; ``c' = sigmoid(i)*g(cand) + sigmoid(f)*c``;
``h' = sigmoid(o)*tanh(c')``.  The reference's candidate has *no* tanh
(nonstandard, ops.py:143-147); that behaviour is kept behind
``candidate_activation='linear'`` while the default here is the standard
``'tanh'`` (see SURVEY.md §7 hard-parts note).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from danet_tpu.ops.nn import dropout, ee, uniform_init


def lstm_init(rng, idim: int, hdim: int, w_scale: Optional[float] = None,
              gate_bias: tuple = (0.0, 0.0, 0.0, 0.0), dtype=jnp.float32):
    """LSTM params: wx [idim,4,h], wh [h,4,h], b [4,h].

    gate_bias = (candidate, input, forget, output) initial biases — the
    reference encoders use (0, 1.5, -1, 1) (modules.py:158-162).
    Equivalent to the reference's single concat([x,h]) @ W[(idim+h),4h]
    with one uniform init over the whole matrix.
    """
    kx, kh = jax.random.split(rng)
    if w_scale is None:
        w_scale = float(1.0 / np.sqrt(hdim))
    b = np.zeros((4, hdim), dtype=np.float32)
    for g in range(4):
        b[g, :] = gate_bias[g]
    return {
        "wx": uniform_init(kx, (idim, 4, hdim), w_scale, dtype),
        "wh": uniform_init(kh, (hdim, 4, hdim), w_scale, dtype),
        "b": jnp.asarray(b, dtype=dtype),
    }


_BACKENDS = ("auto", "xla", "pallas", "pallas-interpret")


def _check_backend(backend: str) -> str:
    """Reject typo'd backend strings instead of silently running the XLA
    scan (same convention as STFT_BACKEND validation in separate_wav)."""
    if backend not in _BACKENDS:
        raise ValueError(
            "Unknown RNN backend %r (expected one of %s)"
            % (backend, ", ".join(_BACKENDS)))
    return backend


def lstm_backend_default() -> str:
    """'pallas' on TPU backends, 'xla' on CPU/GPU and under tensor
    parallelism.

    The Pallas kernel (ops/pallas/lstm.py) uses TPU Mosaic primitives
    (pltpu VMEM specs), so it is only selected for TPU-family backends
    ('tpu', or 'axon' — the tunneled TPU platform); everything else gets
    the portable XLA scan.

    With MESH_MODEL > 1 the gate matmuls are TP-sharded on the 'model'
    axis (parallel/sharding.py); a pallas_call is an opaque custom call
    with no GSPMD partitioning rule, so selecting it would silently
    all-gather the sharded weights and run the scan replicated — 'auto'
    therefore resolves to the partitionable XLA scan whenever tensor
    parallelism is configured.  TP runs do NOT lose the kernel, though:
    the BiLSTM encoders route through ``bilstm_apply_tp`` (batch resharded
    over ('data','model'), kernel per slice) on TPU platforms; this
    fallback only governs plain ``lstm_apply``/``bilstm_apply`` calls.
    """
    from danet_tpu.hparams import hparams
    if int(getattr(hparams, "MESH_MODEL", 1) or 1) > 1:
        return "xla"
    return ("pallas" if jax.default_backend() in ("tpu", "axon")
            else "xla")


def lstm_input_proj(params, x_tm: jnp.ndarray) -> jnp.ndarray:
    """Hoisted input projection: one large MXU GEMM over all timesteps.
    [T, B, idim] -> [T, B, 4, hdim] in the input's dtype."""
    dt = x_tm.dtype
    return ee("tbi,igh->tbgh", x_tm, params["wx"].astype(dt)) \
        + params["b"].astype(dt)


def _lstm_scan(params, x_tm: jnp.ndarray, c0, h0,
               candidate_activation: str, backend: str = "auto",
               return_state: bool = False):
    """Core scan. x_tm: [T, B, idim] time-major. Returns hidden seq [T,B,h]
    (or (hidden seq, (c_final, h_final)) with return_state — XLA scan path
    only; the Pallas kernels do not expose the final carry)."""
    hdim = params["wh"].shape[0]
    t, b = x_tm.shape[0], x_tm.shape[1]
    dt = x_tm.dtype
    xp = lstm_input_proj(params, x_tm)

    # default zero states are derived from xp (not fresh constants) so they
    # inherit xp's varying axes under shard_map (seq/pipe parallel callers);
    # nan_to_num guards against 0*inf = NaN poisoning from non-finite inputs
    if c0 is None:
        c0 = jnp.nan_to_num(xp[0, :, 0]) * 0
    if h0 is None:
        h0 = jnp.nan_to_num(xp[0, :, 0]) * 0

    if _check_backend(backend) == "auto":
        backend = lstm_backend_default()
    if return_state and backend in ("pallas", "pallas-interpret"):
        backend = "xla"
    if backend in ("pallas", "pallas-interpret"):
        from danet_tpu.ops.pallas.lstm import lstm_scan_pallas
        return lstm_scan_pallas(
            xp.reshape(t, b, 4 * hdim),
            params["wh"].astype(dt).reshape(hdim, 4 * hdim),
            c0, h0, candidate_activation == "tanh",
            backend == "pallas-interpret")

    wh = params["wh"].astype(dt)
    g_fn = jnp.tanh if candidate_activation == "tanh" else (lambda z: z)

    def step(carry, xp_t):
        c, h = carry
        act = xp_t + ee("bh,hgk->bgk", h, wh)
        cand = g_fn(act[:, 0])
        i = jax.nn.sigmoid(act[:, 1])
        f = jax.nn.sigmoid(act[:, 2])
        o = jax.nn.sigmoid(act[:, 3])
        c_new = i * cand + f * c
        h_new = o * jnp.tanh(c_new)
        return (c_new, h_new), h_new

    (c_f, h_f), hs = jax.lax.scan(step, (c0, h0), xp)
    return (hs, (c_f, h_f)) if return_state else hs


def lstm_apply(params, x: jnp.ndarray, candidate_activation: str = "tanh",
               reverse: bool = False, c0=None, h0=None,
               backend: str = "auto", return_state: bool = False):
    """Run an LSTM over x [B, T, idim] -> [B, T, hdim].

    reverse=True runs over time-reversed input and re-reverses the output
    (the reference builds its backward BiLSTM direction the same way,
    modules.py:128-136). Initial state is zero, matching the reference's
    per-batch state reset (main.py:432,538-540).
    backend: 'auto' | 'xla' | 'pallas' | 'pallas-interpret'.
    return_state=True additionally returns the final scan carry
    (c, h) — for a reversed scan that is the state after consuming the
    input down to its FIRST frame (sequence-parallel halo warmup,
    parallel/seq_parallel.py).  Forces the XLA scan path.
    """
    x_tm = jnp.swapaxes(x, 0, 1)
    if reverse:
        x_tm = x_tm[::-1]
    out = _lstm_scan(params, x_tm, c0, h0, candidate_activation, backend,
                     return_state=return_state)
    hs, state = out if return_state else (out, None)
    if reverse:
        hs = hs[::-1]
    hs = jnp.swapaxes(hs, 0, 1)
    return (hs, state) if return_state else hs


def bilstm_init(rng, idim: int, hdim: int, w_scale=None,
                gate_bias=(0.0, 0.0, 0.0, 0.0), dtype=jnp.float32):
    """Forward + backward LSTM params (reference modules.py:120-137)."""
    kf, kb = jax.random.split(rng)
    return {
        "fwd": lstm_init(kf, idim, hdim, w_scale, gate_bias, dtype),
        "bwd": lstm_init(kb, idim, hdim, w_scale, gate_bias, dtype),
    }


def bilstm_apply(params, x: jnp.ndarray,
                 candidate_activation: str = "tanh",
                 dropout_rng=None, keep_prob: float = 1.0,
                 backend: str = "auto") -> jnp.ndarray:
    """BiLSTM: concat(fwd, bwd-reversed) [B,T,2h], optional dropout.

    On the Pallas backend both directions run inside ONE fused kernel
    (halves the sequential kernel-loop count per layer; set
    DANET_BILSTM_FUSED=0 to fall back to two separate scans).  On the XLA
    backend the two directions' scans are independent programs that XLA
    schedules concurrently.
    """
    import os

    be = (lstm_backend_default() if _check_backend(backend) == "auto"
          else backend)
    fused = os.environ.get("DANET_BILSTM_FUSED", "1") != "0"
    if fused and be in ("pallas", "pallas-interpret"):
        from danet_tpu.ops.pallas.lstm import bilstm_scan_pallas
        dt = x.dtype
        x_tm = jnp.swapaxes(x, 0, 1)  # [T, B, I]
        t, b = x_tm.shape[0], x_tm.shape[1]
        hdim = params["fwd"]["wh"].shape[0]

        xp2 = jnp.stack(
            [lstm_input_proj(params["fwd"], x_tm).reshape(t, b, 4 * hdim),
             lstm_input_proj(params["bwd"], x_tm[::-1]).reshape(
                 t, b, 4 * hdim)],
            axis=1)                                       # [T, 2, B, 4H]
        wh2 = jnp.stack(
            [params["fwd"]["wh"].astype(dt).reshape(hdim, 4 * hdim),
             params["bwd"]["wh"].astype(dt).reshape(hdim, 4 * hdim)])
        z = jnp.nan_to_num(xp2[0, :, :, :hdim]) * 0
        hs2 = bilstm_scan_pallas(xp2, wh2, z, z,
                                 candidate_activation == "tanh",
                                 be == "pallas-interpret")
        y = jnp.concatenate(
            [jnp.swapaxes(hs2[:, 0], 0, 1),
             jnp.swapaxes(hs2[:, 1][::-1], 0, 1)], axis=-1)
    else:
        h_f = lstm_apply(params["fwd"], x, candidate_activation,
                         backend=be)
        h_b = lstm_apply(params["bwd"], x, candidate_activation,
                         reverse=True, backend=be)
        y = jnp.concatenate([h_f, h_b], axis=-1)
    if dropout_rng is not None and keep_prob < 1.0:
        y = dropout(dropout_rng, y, keep_prob)
    return y


def bilstm_apply_tp(params, x: jnp.ndarray, mesh,
                    candidate_activation: str = "tanh",
                    backend: str = "pallas") -> jnp.ndarray:
    """Fused Pallas BiLSTM under tensor parallelism.

    A ``pallas_call`` is an opaque custom call with no GSPMD partitioning
    rule, so running it directly on 'model'-sharded gate weights would
    silently all-gather them and execute replicated.  The exact TP-over-
    hidden recurrence is also a poor fit for a fused kernel: each step's
    ``h @ Wh`` contracts over the FULL hidden axis, needing a per-step
    all-gather that cannot live inside one kernel launch.

    The TPU-native resolution: for the recurrent stage, reshard the BATCH
    over ('data','model') via shard_map — every device runs the fused
    kernel on a batch slice with the full weights (in_specs P() gathers
    the TP-sharded params ONCE per layer; hdim=300 gate weights are ~1.4MB
    — O(|W|) comm instead of O(T·|h|) per-step collectives).  Activations
    re-shard to the TP layout automatically at the next GSPMD op.  Exact:
    parity-tested vs the XLA scan on the CPU interpreter path
    (tests/test_parallel.py).

    Requires batch % (n_data * n_model) == 0; callers fall back to the
    partitionable XLA scan otherwise.  Dropout is the caller's job (a
    shared key inside shard_map would correlate masks across slices).
    """
    import functools

    from jax.sharding import PartitionSpec as P

    axes = tuple(a for a in ("data", "model") if a in mesh.shape)
    assert axes, "mesh has neither 'data' nor 'model' axis"
    n_slices = 1
    for a in axes:
        n_slices *= mesh.shape[a]
    assert x.shape[0] % n_slices == 0, (
        "batch %d must divide over %d mesh slices" % (x.shape[0], n_slices))

    # check_vma off: the body is collective-free (a pure per-slice kernel
    # call), and pallas_call's out_shape carries no vma annotation
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axes)), out_specs=P(axes), check_vma=False)
    def run(p_full, x_l):
        return bilstm_apply(p_full, x_l, candidate_activation,
                            backend=backend)

    return run(params, x)


def gru_init(rng, idim: int, hdim: int, w_scale: Optional[float] = None,
             dtype=jnp.float32):
    """GRU params (reference ops.py:151-188): gate and candidate linears.

    Candidate bias inits to 1.0 as in the reference (ops.py:175-176).
    """
    kgx, kgh, kcx, kch = jax.random.split(rng, 4)
    if w_scale is None:
        w_scale = float(0.1 / np.sqrt(hdim))  # reference main.py:175
    return {
        "wgx": uniform_init(kgx, (idim, 2, hdim), w_scale, dtype),
        "wgh": uniform_init(kgh, (hdim, 2, hdim), w_scale, dtype),
        "bg": jnp.zeros((2, hdim), dtype=dtype),
        "wcx": uniform_init(kcx, (idim, hdim), w_scale, dtype),
        "wch": uniform_init(kch, (hdim, hdim), w_scale, dtype),
        "bc": jnp.ones((hdim,), dtype=dtype),
    }


def gru_apply(params, x: jnp.ndarray, c0=None,
              backend: str = "auto", return_state: bool = False):
    """GRU over [B, T, idim] -> [B, T, hdim].

    Semantics per reference ops.py:151-188: gates (r, u) from concat(x, c);
    candidate tanh from concat(x, c*r); c' = c*u + cand*(1-u).
    backend: 'auto' | 'xla' | 'pallas' | 'pallas-interpret' — as with the
    LSTM, 'auto' picks the VMEM-resident Pallas kernel on TPU backends.
    return_state=True additionally returns the final carry c (forces the
    XLA scan path; sequence-parallel halo warmup).
    """
    hdim = params["wch"].shape[0]
    dt = x.dtype
    x_tm = jnp.swapaxes(x, 0, 1)
    gx = ee("tbi,igh->tbgh", x_tm, params["wgx"].astype(dt)) \
        + params["bg"].astype(dt)
    cx = ee("tbi,ih->tbh", x_tm, params["wcx"].astype(dt)) \
        + params["bc"].astype(dt)
    wgh = params["wgh"].astype(dt)
    wch = params["wch"].astype(dt)

    if c0 is None:
        c0 = jnp.nan_to_num(cx[0]) * 0  # varying-axis-safe zeros (see LSTM)

    if _check_backend(backend) == "auto":
        backend = lstm_backend_default()
    if return_state and backend in ("pallas", "pallas-interpret"):
        backend = "xla"
    if backend in ("pallas", "pallas-interpret"):
        from danet_tpu.ops.pallas.gru import gru_scan_pallas
        t, b = x_tm.shape[0], x_tm.shape[1]
        cs = gru_scan_pallas(
            gx.reshape(t, b, 2 * hdim), cx, wgh.reshape(hdim, 2 * hdim),
            wch, c0, backend == "pallas-interpret")
        return jnp.swapaxes(cs, 0, 1)

    def step(c, inp):
        gx_t, cx_t = inp
        gates = jax.nn.sigmoid(gx_t + ee("bh,hgk->bgk", c, wgh))
        r, u = gates[:, 0], gates[:, 1]
        cand = jnp.tanh(cx_t + ee("bh,hk->bk", c * r, wch))
        c_new = c * u + cand * (1.0 - u)
        return c_new, c_new

    c_f, cs = jax.lax.scan(step, c0, (gx, cx))
    cs = jnp.swapaxes(cs, 0, 1)
    return (cs, c_f) if return_state else cs
