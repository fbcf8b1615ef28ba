"""Conv-TasNet model-family tests: registry selection, shapes, learning
on a separable batch, framing/overlap-add oracle, serving export.

The reference has exactly one model class (main.py:61); MODEL_TYPE +
models/tasnet.py are a new waveform-domain family (Luo & Mesgarani 2019)
reusing the framework's TCN blocks and uPIT SI-SNR objective.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from danet_tpu.hparams import hparams
from danet_tpu.models import DaNet, TasNet
from danet_tpu.models import tasnet as tn
from danet_tpu.ops import dsp


@pytest.fixture()
def tiny_tasnet(fresh_hparams):
    hp = fresh_hparams
    hp.MODEL_TYPE = "tasnet-v1"
    hp.BATCH_SIZE = 2
    hp.TASNET_FILTERS = 64
    hp.TASNET_BOTTLENECK = 32
    hp.TASNET_HIDDEN = 48
    hp.TASNET_BLOCKS = 3
    hp.TASNET_REPEATS = 2
    model = hp.get_model()()
    assert isinstance(model, TasNet)
    params = model.init(jax.random.PRNGKey(0))
    return hp, model, params


def test_model_registry_default_is_danet(fresh_hparams):
    assert fresh_hparams.get_model() is DaNet
    fresh_hparams.MODEL_TYPE = "tasnet-v1"
    assert fresh_hparams.get_model() is TasNet


def test_frame_overlap_add_roundtrip():
    """_overlap_add is the exact transpose of _frame: framing a signal
    and overlap-adding with an all-ones basis sums each sample once per
    covering frame (numpy oracle)."""
    rng = np.random.RandomState(0)
    x = rng.randn(3, 72).astype(np.float32)
    win, stride = 16, 8
    frames = np.asarray(tn._frame(jnp.asarray(x), win, stride))
    k = (72 - win) // stride + 1
    assert frames.shape == (3, k, win)
    for i in range(k):
        np.testing.assert_array_equal(
            frames[:, i], x[:, i * stride:i * stride + win])
    out = np.asarray(tn._overlap_add(jnp.asarray(frames), stride))
    # oracle: scatter-add
    want = np.zeros((3, (k - 1) * stride + win), np.float32)
    for i in range(k):
        want[:, i * stride:i * stride + win] += frames[:, i]
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_shapes_and_finiteness(tiny_tasnet):
    hp, model, params = tiny_tasnet
    src_ri = jnp.asarray(np.random.RandomState(0).randn(
        2, hp.MAX_N_SIGNAL, 32, hp.FEATURE_SIZE, 2).astype(np.float32))
    loss, aux = jax.jit(model.train_loss)(params, src_ri, None)
    assert np.isfinite(float(loss)) and np.isfinite(float(aux["snr"]))
    m = jax.jit(model.valid_metrics)(params, src_ri)
    assert set(m) >= {"loss", "SNR"}
    sep = jax.jit(model.separate)(params, jnp.sum(src_ri, axis=1))
    assert sep.shape == (2, hp.MAX_N_SIGNAL, 32, hp.FEATURE_SIZE, 2)
    wav = jnp.asarray(np.random.RandomState(1).randn(
        2, 1000).astype(np.float32))
    out = jax.jit(model.separate_wav)(params, wav)
    assert out.shape == (2, hp.MAX_N_SIGNAL, 1000)
    assert np.isfinite(np.asarray(out)).all()


def test_learns_separable_mixture(tiny_tasnet):
    """A few Adam steps on one fixed two-tone batch push the uPIT
    negative-SI-SNR loss down by several dB — the end-to-end gradient
    through basis encoder, TCN, masks and decoder works."""
    import optax
    hp, model, params = tiny_tasnet
    sr, length = hp.SMPRATE, 4000
    t = np.arange(length) / sr
    rng = np.random.RandomState(0)
    src = np.stack([
        np.stack([np.sin(2 * np.pi * (300 + 40 * b) * t),
                  np.sin(2 * np.pi * (1100 + 60 * b) * t)])
        for b in range(2)]).astype(np.float32)        # [B, N, L]
    spec = dsp.stft_ri(jnp.asarray(src), hp.FFT_SIZE, hp.FFT_STRIDE,
                       hp.FFT_WND_ARRAY)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, aux), g = jax.value_and_grad(
            model.train_loss, has_aux=True)(params, spec, None)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params2, first = params, None
    for i in range(30):
        params2, opt_state, loss = step(params2, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first - 3.0, (first, float(loss))


def test_rejects_unrouted_parallelism(fresh_hparams):
    hp = fresh_hparams
    hp.MODEL_TYPE = "tasnet-v1"
    hp.MESH_MODEL = 2
    with pytest.raises(ValueError, match="data parallelism"):
        hp.get_model()()


def test_serve_export_roundtrip(tiny_tasnet, tmp_path):
    """The AOT serving exporter is model-agnostic: a TasNet artifact
    exports, reloads and matches the live model."""
    from danet_tpu import serve
    hp, model, params = tiny_tasnet
    out_dir = str(tmp_path / "tasnet_art")
    serve.export_separator(model, params, out_dir, lengths=[4096], batch=1)
    bundle = serve.load_separator(out_dir)
    wav = np.random.RandomState(2).randn(4096).astype(np.float32) * 0.1
    got = bundle.separate(wav)
    want = np.asarray(jax.jit(
        lambda w: model.separate_wav(params, w))(wav[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mask_options(tiny_tasnet):
    hp, model, params = tiny_tasnet
    wav = jnp.asarray(np.random.RandomState(3).randn(
        1, 512).astype(np.float32))
    outs = {}
    for mask in ("sigmoid", "relu", "softmax"):
        hp.TASNET_MASK = mask
        outs[mask] = np.asarray(model.separate_wav(params, wav))
    assert not np.allclose(outs["sigmoid"], outs["softmax"])
    hp.TASNET_MASK = "bogus"
    with pytest.raises(ValueError, match="TASNET_MASK"):
        model.separate_wav(params, wav)


@pytest.fixture()
def causal_tasnet(fresh_hparams):
    hp = fresh_hparams
    hp.MODEL_TYPE = "tasnet-v1"
    hp.BATCH_SIZE = 1
    hp.TASNET_FILTERS = 48
    hp.TASNET_BOTTLENECK = 24
    hp.TASNET_HIDDEN = 32
    hp.TASNET_BLOCKS = 3
    hp.TASNET_REPEATS = 2
    hp.TASNET_CAUSAL = True
    model = hp.get_model()()
    params = model.init(jax.random.PRNGKey(1))
    return hp, model, params


def test_stream_exact_and_chunk_invariant(causal_tasnet):
    """Causal streaming equals the offline separation of the
    zero-prefixed stream (delayed by win - stride samples) and is
    invariant to how the stream is chunked."""
    hp, model, params = causal_tasnet
    lag = model.stream_latency_samples()
    rng = np.random.RandomState(0)
    wav = rng.randn(1, 1024).astype(np.float32) * 0.3

    # offline oracle: separate the zero-prefixed signal
    pre = np.concatenate([np.zeros((1, lag), np.float32), wav], axis=-1)
    want = np.asarray(model.separate_wav(params, jnp.asarray(pre)))

    for chunks in ((1024,), (256,) * 4, (64,) * 16, (8,) * 128):
        out, state = model.stream_init(
            params, jnp.asarray(wav[:, :chunks[0]]))
        parts = [np.asarray(out)]
        off = chunks[0]
        for c in chunks[1:]:
            out, state = model.stream_step(
                params, state, jnp.asarray(wav[:, off:off + c]))
            parts.append(np.asarray(out))
            off += c
        got = np.concatenate(parts, axis=-1)
        assert got.shape == (1, hp.MAX_N_SIGNAL, 1024)
        np.testing.assert_allclose(got, want[..., :1024],
                                   rtol=2e-4, atol=2e-5)


def test_stream_requires_causal(tiny_tasnet):
    hp, model, params = tiny_tasnet
    with pytest.raises(ValueError, match="TASNET_CAUSAL"):
        model.stream_init(params, jnp.zeros((1, 64)))


def test_stream_export_roundtrip(causal_tasnet, tmp_path):
    """export_streamer picks up the model's granularity/latency hooks
    and the artifact reproduces live streaming."""
    from danet_tpu import serve
    hp, model, params = causal_tasnet
    out_dir = str(tmp_path / "stream_art")
    man = serve.export_streamer(model, params, out_dir,
                                chunk_samples=64, warmup_samples=256)
    assert man["latency_samples"] == model.stream_latency_samples()
    bundle = serve.load_streamer(out_dir)
    rng = np.random.RandomState(1)
    wav = rng.randn(512).astype(np.float32) * 0.3
    parts = [bundle.start(wav[:256])]
    for lo in range(256, 512, 64):
        parts.append(bundle.feed(wav[lo:lo + 64]))
    got = np.concatenate(parts, axis=-1)[0]

    out, state = model.stream_init(params, jnp.asarray(wav[None, :256]))
    live = [np.asarray(out)]
    for lo in range(256, 512, 64):
        out, state = model.stream_step(
            params, state, jnp.asarray(wav[None, lo:lo + 64]))
        live.append(np.asarray(out))
    np.testing.assert_allclose(got, np.concatenate(live, -1)[0],
                               rtol=1e-5, atol=1e-6)


def test_sp_forward_exact(fresh_hparams):
    """MESH_SEQ=2 sequence-parallel forward (frame halo + conv halos +
    OLA boundary exchange) matches the dense forward bit-for-bit modulo
    f32 reduction order."""
    from danet_tpu.parallel import set_active_mesh
    from danet_tpu.parallel.sharding import make_mesh

    hp = fresh_hparams
    hp.MODEL_TYPE = "tasnet-v1"
    hp.BATCH_SIZE = 2
    hp.TASNET_FILTERS = 48
    hp.TASNET_BOTTLENECK = 24
    hp.TASNET_HIDDEN = 32
    hp.TASNET_BLOCKS = 3
    hp.TASNET_REPEATS = 2
    model = hp.get_model()()
    params = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.RandomState(0).randn(
        2, 1024).astype(np.float32))
    dense = np.asarray(model.separate_wav(params, wav))

    hp.MESH_SEQ = 2
    mesh = make_mesh(2, 1, jax.devices()[:4], n_seq=2)
    set_active_mesh(mesh)
    try:
        model_sp = hp.get_model()()
        sp = np.asarray(jax.jit(model_sp.separate_wav)(params, wav))
    finally:
        set_active_mesh(None)
        hp.MESH_SEQ = 1
    np.testing.assert_allclose(sp, dense, rtol=1e-5, atol=1e-6)


def test_trainer_seq_parallel_tasnet_step(fresh_hparams):
    """A Trainer train step with MESH_SEQ=2 (dp=2 x sp=2) matches the
    single-device tasnet step numerically (the SP route is exact)."""
    from danet_tpu.train.trainer import Trainer, prepare_batch

    hp = fresh_hparams
    hp.MODEL_TYPE = "tasnet-v1"
    hp.BATCH_SIZE = 4
    hp.TASNET_FILTERS = 48
    hp.TASNET_BOTTLENECK = 24
    hp.TASNET_HIDDEN = 32
    hp.TASNET_BLOCKS = 3
    hp.TASNET_REPEATS = 2
    hp.digest()
    rngnp = np.random.RandomState(0)
    flat = rngnp.rand(hp.BATCH_SIZE * hp.MAX_N_SIGNAL, 16,
                      hp.FEATURE_SIZE).astype(np.float32)
    batch = prepare_batch(flat, hp.BATCH_SIZE, hp.MAX_N_SIGNAL)

    def one_step(n_seq, n_data):
        hp.MESH_SEQ, hp.MESH_DATA = n_seq, n_data
        trainer = Trainer(hp.get_model()(),
                          name="sptas%d" % n_seq)
        state = trainer.init_state(jax.random.PRNGKey(0))
        src = trainer._put_batch(batch)
        state["params"], state["opt_state"], m = trainer._train_step(
            state["params"], state["opt_state"], src,
            jax.random.PRNGKey(1))
        return float(m["loss"]), jax.device_get(state["params"])

    loss_sp, params_sp = one_step(2, 2)
    loss_ref, params_ref = one_step(1, 1)
    np.testing.assert_allclose(loss_sp, loss_ref, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(params_ref),
                    jax.tree_util.tree_leaves(params_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)
