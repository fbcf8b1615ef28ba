"""RNN cell math vs numpy oracles (reference semantics: app/ops.py:110-188)."""
import jax
import jax.numpy as jnp
import numpy as np

from danet_tpu.ops import rnn


def _numpy_lstm(params, x, candidate_activation):
    """Step-by-step numpy oracle of the reference LSTM cell
    (ops.py:138-148): act = [cand|i|f|o]; c' = sig(i)*g(cand)+sig(f)*c;
    h' = sig(o)*tanh(c')."""
    wx = np.asarray(params["wx"])  # [I,4,H]
    wh = np.asarray(params["wh"])  # [H,4,H]
    b = np.asarray(params["b"])    # [4,H]
    bsz, t, _ = x.shape
    h = np.zeros((bsz, wh.shape[0]))
    c = np.zeros((bsz, wh.shape[0]))
    sig = lambda z: 1 / (1 + np.exp(-z))
    g = np.tanh if candidate_activation == "tanh" else (lambda z: z)
    hs = []
    for ti in range(t):
        act = (np.einsum("bi,igh->bgh", x[:, ti], wx)
               + np.einsum("bh,hgk->bgk", h, wh) + b)
        cand, i, f, o = act[:, 0], sig(act[:, 1]), sig(act[:, 2]), \
            sig(act[:, 3])
        c = i * g(cand) + f * c
        h = o * np.tanh(c)
        hs.append(h)
    return np.stack(hs, axis=1)


def test_lstm_matches_numpy_oracle():
    rng = jax.random.PRNGKey(0)
    params = rnn.lstm_init(rng, 5, 7, gate_bias=(0.0, 1.5, -1.0, 1.0))
    x = np.random.RandomState(0).randn(3, 6, 5).astype(np.float32)
    for act in ["tanh", "linear"]:
        out = np.asarray(rnn.lstm_apply(params, jnp.asarray(x), act))
        ref = _numpy_lstm(params, x, act)
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_lstm_reverse_is_time_reflection():
    rng = jax.random.PRNGKey(1)
    params = rnn.lstm_init(rng, 4, 6)
    x = np.random.RandomState(1).randn(2, 8, 4).astype(np.float32)
    fwd_on_reversed = np.asarray(
        rnn.lstm_apply(params, jnp.asarray(x[:, ::-1].copy()), "tanh"))
    bwd = np.asarray(rnn.lstm_apply(params, jnp.asarray(x), "tanh",
                                    reverse=True))
    np.testing.assert_allclose(bwd, fwd_on_reversed[:, ::-1], atol=1e-6)


def test_bilstm_concat_layout():
    rng = jax.random.PRNGKey(2)
    params = rnn.bilstm_init(rng, 4, 5)
    x = np.random.RandomState(2).randn(2, 7, 4).astype(np.float32)
    out = np.asarray(rnn.bilstm_apply(params, jnp.asarray(x), "tanh"))
    assert out.shape == (2, 7, 10)
    f = np.asarray(rnn.lstm_apply(params["fwd"], jnp.asarray(x), "tanh"))
    b = np.asarray(rnn.lstm_apply(params["bwd"], jnp.asarray(x), "tanh",
                                  reverse=True))
    np.testing.assert_allclose(out, np.concatenate([f, b], axis=-1),
                               atol=1e-6)


def test_bilstm_dropout_active_only_with_rng():
    rng = jax.random.PRNGKey(3)
    params = rnn.bilstm_init(rng, 4, 5)
    x = np.random.RandomState(3).randn(2, 7, 4).astype(np.float32)
    base = np.asarray(rnn.bilstm_apply(params, jnp.asarray(x), "tanh"))
    dropped = np.asarray(rnn.bilstm_apply(
        params, jnp.asarray(x), "tanh",
        dropout_rng=jax.random.PRNGKey(4), keep_prob=0.5))
    assert (dropped == 0).sum() > 0
    # zero-out positions come from the mask; surviving entries are scaled
    nz = dropped != 0
    np.testing.assert_allclose(dropped[nz], base[nz] / 0.5, rtol=1e-5)


def _numpy_gru(params, x):
    wgx, wgh = np.asarray(params["wgx"]), np.asarray(params["wgh"])
    bg = np.asarray(params["bg"])
    wcx, wch = np.asarray(params["wcx"]), np.asarray(params["wch"])
    bc = np.asarray(params["bc"])
    bsz, t, _ = x.shape
    c = np.zeros((bsz, wch.shape[0]))
    sig = lambda z: 1 / (1 + np.exp(-z))
    out = []
    for ti in range(t):
        gates = sig(np.einsum("bi,igh->bgh", x[:, ti], wgx)
                    + np.einsum("bh,hgk->bgk", c, wgh) + bg)
        r, u = gates[:, 0], gates[:, 1]
        cand = np.tanh(x[:, ti] @ wcx + (c * r) @ wch + bc)
        c = c * u + cand * (1 - u)
        out.append(c)
    return np.stack(out, axis=1)


def test_gru_matches_numpy_oracle():
    rng = jax.random.PRNGKey(5)
    params = rnn.gru_init(rng, 4, 6)
    x = np.random.RandomState(5).randn(2, 5, 4).astype(np.float32)
    out = np.asarray(rnn.gru_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, _numpy_gru(params, x), atol=1e-5)


def test_unknown_backend_rejected(fresh_hparams):
    import jax
    import numpy as np
    import pytest
    from danet_tpu.ops import rnn

    params = rnn.lstm_init(jax.random.PRNGKey(0), 4, 4)
    x = np.zeros((2, 4, 4), np.float32)
    with pytest.raises(ValueError):
        rnn.lstm_apply(params, x, backend="palas")
    bparams = rnn.bilstm_init(jax.random.PRNGKey(1), 4, 4)
    with pytest.raises(ValueError):
        rnn.bilstm_apply(bparams, x, backend="Pallas")
    gparams = rnn.gru_init(jax.random.PRNGKey(2), 4, 4)
    with pytest.raises(ValueError):
        rnn.gru_apply(gparams, x, backend="xl a")
