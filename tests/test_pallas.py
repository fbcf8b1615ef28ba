"""Pallas kernel tests (interpret mode on CPU; real-hardware parity is
exercised by bench/TPU runs — see .claude/skills/verify/SKILL.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from danet_tpu.ops import rnn
from danet_tpu.ops.nn import ee
from danet_tpu.ops.pallas.lstm import lstm_scan_pallas


def _pallas_lstm(p, x, t, b, h, tanh_cand=True):
    x_tm = jnp.swapaxes(x, 0, 1)
    xp = (ee("tbi,igh->tbgh", x_tm, p["wx"]) + p["b"]).reshape(t, b, 4 * h)
    wh = p["wh"].reshape(h, 4 * h)
    z = jnp.zeros((b, h), x.dtype)
    hs = lstm_scan_pallas(xp, wh, z, z, tanh_cand, True)  # interpret
    return jnp.swapaxes(hs, 0, 1)


@pytest.mark.parametrize("tanh_cand", [True, False])
def test_pallas_lstm_forward_matches_xla(fresh_hparams, tanh_cand):
    T, B, I, H = 10, 4, 6, 8
    params = rnn.lstm_init(jax.random.PRNGKey(0), I, H,
                           gate_bias=(0.0, 1.5, -1.0, 1.0))
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, I).astype(
        np.float32))
    act = "tanh" if tanh_cand else "linear"
    ref = rnn.lstm_apply(params, x, act, backend="xla")
    out = _pallas_lstm(params, x, T, B, H, tanh_cand)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pallas_lstm_gradients_match_xla(fresh_hparams):
    T, B, I, H = 8, 3, 5, 7
    params = rnn.lstm_init(jax.random.PRNGKey(1), I, H)
    x = jnp.asarray(np.random.RandomState(1).randn(B, T, I).astype(
        np.float32))

    def loss_ref(p):
        return jnp.sum(rnn.lstm_apply(p, x, "tanh", backend="xla") ** 2)

    def loss_pal(p):
        return jnp.sum(_pallas_lstm(p, x, T, B, H) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_pal = jax.grad(loss_pal)(params)
    for k in ["wx", "wh", "b"]:
        np.testing.assert_allclose(
            np.asarray(g_pal[k]), np.asarray(g_ref[k]),
            atol=2e-5, rtol=1e-4)


def test_pallas_backend_via_rnn_api(fresh_hparams):
    """backend='pallas-interpret' through the public lstm_apply surface."""
    T, B, I, H = 6, 2, 4, 5
    params = rnn.lstm_init(jax.random.PRNGKey(2), I, H)
    x = jnp.asarray(np.random.RandomState(2).randn(B, T, I).astype(
        np.float32))
    ref = rnn.lstm_apply(params, x, "tanh", backend="xla")
    out = rnn.lstm_apply(params, x, "tanh", backend="pallas-interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # reverse (bwd BiLSTM direction) goes through the same kernel
    ref_r = rnn.lstm_apply(params, x, "tanh", reverse=True, backend="xla")
    out_r = rnn.lstm_apply(params, x, "tanh", reverse=True,
                           backend="pallas-interpret")
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref_r),
                               atol=1e-6)


def test_pallas_stft_interpret_matches_dsp(fresh_hparams, monkeypatch):
    """Pallas STFT kernel in interpret mode vs the XLA dsp reference."""
    import danet_tpu.ops.pallas.stft as pstft
    from danet_tpu.ops import dsp

    orig = pstft.pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pstft.pl, "pallas_call", interp_call)
    pstft._stft_pallas_padded._clear_cache()
    hp = fresh_hparams
    w = hp.FFT_WND_ARRAY
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 12000).astype(np.float32))
    ref = np.asarray(dsp.stft_ri(x, 256, 64, w))
    out = np.asarray(pstft.stft_ri_pallas(x, 256, 64, w))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)
    pstft._stft_pallas_padded._clear_cache()


def test_fused_bilstm_matches_separate(fresh_hparams):
    """Fused bidirectional kernel == two separate scans (interpret mode),
    forward and gradients."""
    T, B, I, H = 8, 3, 5, 6
    params = rnn.bilstm_init(jax.random.PRNGKey(7), I, H,
                             gate_bias=(0.0, 1.5, -1.0, 1.0))
    x = jnp.asarray(np.random.RandomState(7).randn(B, T, I).astype(
        np.float32))
    ref = rnn.bilstm_apply(params, x, "tanh", backend="xla")
    out = rnn.bilstm_apply(params, x, "tanh", backend="pallas-interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    g_ref = jax.grad(lambda p: jnp.sum(
        rnn.bilstm_apply(p, x, "tanh", backend="xla") ** 2))(params)
    g_out = jax.grad(lambda p: jnp.sum(
        rnn.bilstm_apply(p, x, "tanh",
                         backend="pallas-interpret") ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_out)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)


def test_separate_wav_pallas_stft_dispatch(fresh_hparams, monkeypatch):
    """separate_wav's Pallas-STFT branch (interpret mode) == XLA branch."""
    import danet_tpu.ops.pallas.stft as pstft
    from danet_tpu.models import DaNet

    orig = pstft.pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pstft.pl, "pallas_call", interp_call)
    pstft._stft_pallas_padded._clear_cache()
    hp = fresh_hparams
    hp.BATCH_SIZE = 1
    model = DaNet()
    params = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(
        (np.random.RandomState(0).randn(1, 3000) * 0.1).astype(np.float32))
    hp.STFT_BACKEND = "xla"
    ref = np.asarray(model.separate_wav(params, wav))
    hp.STFT_BACKEND = "pallas"
    out = np.asarray(model.separate_wav(params, wav))
    np.testing.assert_allclose(out, ref, atol=1e-4)
    pstft._stft_pallas_padded._clear_cache()

    # explicit pallas with an incompatible stride must raise, and unknown
    # backends are rejected
    import pytest as _pytest
    hp.FFT_STRIDE = 60
    with _pytest.raises(ValueError):
        model.separate_wav(params, wav)
    hp.FFT_STRIDE = 64
    hp.STFT_BACKEND = "palas"
    with _pytest.raises(ValueError):
        model.separate_wav(params, wav)


def test_pallas_gru_forward_matches_xla(fresh_hparams):
    T, B, I, H = 10, 4, 6, 8
    params = rnn.gru_init(jax.random.PRNGKey(3), I, H)
    x = jnp.asarray(np.random.RandomState(3).randn(B, T, I).astype(
        np.float32))
    ref = rnn.gru_apply(params, x, backend="xla")
    out = rnn.gru_apply(params, x, backend="pallas-interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pallas_gru_gradients_match_xla(fresh_hparams):
    T, B, I, H = 8, 3, 5, 7
    params = rnn.gru_init(jax.random.PRNGKey(4), I, H)
    x = jnp.asarray(np.random.RandomState(4).randn(B, T, I).astype(
        np.float32))

    def loss(p, backend):
        return jnp.sum(rnn.gru_apply(p, x, backend=backend) ** 2)

    g_ref = jax.grad(loss)(params, "xla")
    g_pal = jax.grad(loss)(params, "pallas-interpret")
    for k in ["wgx", "wgh", "bg", "wcx", "wch", "bc"]:
        np.testing.assert_allclose(
            np.asarray(g_pal[k]), np.asarray(g_ref[k]),
            atol=2e-5, rtol=1e-4, err_msg=k)


def test_pallas_stft_logmag_branch_matches_dsp(fresh_hparams, monkeypatch):
    """The fused (mag, log1p(mag)) feature branch vs the XLA reference."""
    import danet_tpu.ops.pallas.stft as pstft
    from danet_tpu.ops import dsp

    orig = pstft.pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pstft.pl, "pallas_call", interp_call)
    pstft._stft_pallas_padded._clear_cache()
    hp = fresh_hparams
    w = hp.FFT_WND_ARRAY
    x = jnp.asarray(
        np.random.RandomState(1).randn(2, 8000).astype(np.float32))
    ri = np.asarray(dsp.stft_ri(x, 256, 64, w))
    mag_ref = np.sqrt((ri ** 2).sum(-1))
    out = np.asarray(pstft.stft_ri_pallas(x, 256, 64, w, logmag=True))
    np.testing.assert_allclose(out[..., 0], mag_ref, atol=2e-5)
    np.testing.assert_allclose(out[..., 1], np.log1p(mag_ref), atol=2e-5)
    pstft._stft_pallas_padded._clear_cache()


def test_stft_basis_cached():
    import danet_tpu.ops.pallas.stft as pstft
    w = np.hanning(256).astype(np.float32)
    a = pstft._basis_banded(256, 64, w)
    b = pstft._basis_banded(256, 64, w)
    assert a is b  # second call served from cache
