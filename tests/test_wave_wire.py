"""TRANSFER_DOMAIN='wave': waveform wire + on-device STFT front-end.

The spectra wire ships f32 complex spectrograms every step (the
reference's feed_dict contract, main.py:427-431); the wave wire ships
raw audio (optionally int16 PCM) and runs the GEMM STFT inside the
jitted step — 4-8x fewer host->device bytes.  These tests pin:
shape/crop semantics of prepare_batch_wave, numerical parity of the
two wires on identical utterances, the int16 quantization path, the
end-to-end Trainer loop (incl. TRAIN_STEPS_PER_CALL stacking), and the
loud failures for non-wave datasets / invalid dtype combos.
"""
import jax
import numpy as np
import pytest

from danet_tpu.data.dataset import WhiteNoiseData
from danet_tpu.data.synth import SyntheticTonesData
from danet_tpu.models import DaNet
from danet_tpu.ops.dsp import stft_frame_count
from danet_tpu.parallel import make_mesh
from danet_tpu.train.trainer import (
    Trainer, prepare_batch, prepare_batch_wave)


def _hp(hp, **kw):
    hp.BATCH_SIZE = 2
    hp.SMPRATE = 4000
    hp.SYNTH_BATCHES = 2
    for k, v in kw.items():
        setattr(hp, k, v)
    hp.digest()
    return hp


def _one_device_trainer(name="wavewire"):
    return Trainer(DaNet(), name=name,
                   mesh=make_mesh(1, 1, devices=jax.devices()[:1]))


def test_prepare_batch_wave_shapes(fresh_hparams):
    hp = _hp(fresh_hparams)
    fft, stride = hp.FFT_SIZE, hp.FFT_STRIDE
    rng = np.random.RandomState(0)
    flat = rng.randn(4, 6000).astype(np.float32)
    # no crop/bucket: sample axis snaps to the (t-1)*stride frame grid
    out = prepare_batch_wave(flat, 2, 2, fft, stride)
    t = stft_frame_count(6000, fft, stride)
    assert out.shape == (2, 2, (t - 1) * stride)
    assert stft_frame_count(out.shape[-1], fft, stride) == t
    # crop to max_len frames
    out = prepare_batch_wave(flat, 2, 2, fft, stride, max_len=32,
                             rng=np.random.RandomState(1))
    assert out.shape == (2, 2, 31 * stride)
    assert stft_frame_count(out.shape[-1], fft, stride) == 32
    # bucket pads the frame count up to a multiple
    out = prepare_batch_wave(flat, 2, 2, fft, stride, max_len=30, bucket=16,
                             rng=np.random.RandomState(1))
    assert stft_frame_count(out.shape[-1], fft, stride) == 32
    # the crop is a contiguous slice of the source (plus frame-grid pad)
    assert out.dtype == np.float32


def test_wave_wire_matches_spectra_wire(fresh_hparams):
    """Identical utterances through both wires -> identical valid metrics.

    SyntheticTonesData._make_batch_wave shares _make_batch's RNG stream,
    so batch b's waveforms ARE the signals the spectra epoch STFT'd;
    the on-device GEMM STFT is scipy-parity to ~1e-6."""
    hp = _hp(fresh_hparams)
    ds = SyntheticTonesData()
    ds.install_and_load()
    bs = hp.BATCH_SIZE * hp.MAX_N_SIGNAL
    spec = next(iter(ds.epoch("train", bs)))[0]
    wave = next(iter(ds.epoch_wave("train", bs)))[0]

    spec_b = prepare_batch(spec, hp.BATCH_SIZE, hp.MAX_N_SIGNAL)
    t_spec = Trainer(DaNet(), name="specwire",
                     mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    state = t_spec.init_state(jax.random.PRNGKey(0))
    m_spec = jax.device_get(t_spec._valid_step(
        state["params"], t_spec._put_batch(spec_b)))

    hp.TRANSFER_DOMAIN = "wave"
    wave_b = prepare_batch_wave(
        wave, hp.BATCH_SIZE, hp.MAX_N_SIGNAL, hp.FFT_SIZE, hp.FFT_STRIDE)
    t_wave = _one_device_trainer()
    assert wave_b.shape[:2] == (hp.BATCH_SIZE, hp.MAX_N_SIGNAL)
    m_wave = jax.device_get(t_wave._valid_step(
        state["params"], t_wave._put_batch(wave_b)))

    for k in m_spec:
        np.testing.assert_allclose(
            m_wave[k], m_spec[k], rtol=2e-4, atol=2e-5, err_msg=k)


def test_int16_wire_close_to_f32(fresh_hparams):
    hp = _hp(fresh_hparams, TRANSFER_DOMAIN="wave")
    ds = SyntheticTonesData()
    ds.install_and_load()
    bs = hp.BATCH_SIZE * hp.MAX_N_SIGNAL
    wave = next(iter(ds.epoch_wave("train", bs)))[0]
    wave_b = prepare_batch_wave(
        wave, hp.BATCH_SIZE, hp.MAX_N_SIGNAL, hp.FFT_SIZE, hp.FFT_STRIDE)
    tr = _one_device_trainer()
    state = tr.init_state(jax.random.PRNGKey(0))
    m_f32 = jax.device_get(tr._valid_step(
        state["params"], tr._put_batch(wave_b)))

    hp.TRANSFER_DTYPE = "int16"
    tr16 = _one_device_trainer("wavewire16")
    put = tr16._put_batch(wave_b)
    assert put.dtype == np.int16  # PCM actually crossed the wire
    m_i16 = jax.device_get(tr16._valid_step(state["params"], put))
    for k in m_f32:
        np.testing.assert_allclose(
            m_i16[k], m_f32[k], rtol=2e-3, atol=1e-3, err_msg=k)


def test_wave_train_loop_end_to_end(fresh_hparams, tmp_path):
    """Full Trainer.train on the wave wire: int16 PCM, K-stacked steps,
    valid sweep — loss finite and params updated."""
    hp = _hp(fresh_hparams, TRANSFER_DOMAIN="wave",
             TRANSFER_DTYPE="int16", TRAIN_STEPS_PER_CALL=2,
             MAX_TRAIN_LEN=32, TIME_BUCKET=32, METRICS_EVERY=2)
    ds = SyntheticTonesData()
    ds.install_and_load()
    tr = Trainer(DaNet(), name="waveloop", save_dir=str(tmp_path),
                 mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    state = tr.init_state(jax.random.PRNGKey(0))
    p0 = jax.device_get(state["params"])
    state = tr.train(1, ds, save_on_epoch=False, valid_on_epoch=True,
                     state=state)
    p1 = jax.device_get(state["params"])
    changed = any(
        np.any(a != b) for a, b in zip(
            jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)))
    assert changed
    assert state["step"] == ds.N_BATCHES


def test_int16_wire_exact_for_16bit_material(fresh_hparams):
    """Symmetric 32768 scaling: integer-PCM-origin samples cross the
    int16 wire bit-exactly when WAVE_PCM_SCALE matches the dataset's
    raw scale (the wav-dir convention, WAVE_SCALE=32768)."""
    hp = _hp(fresh_hparams, TRANSFER_DOMAIN="wave",
             TRANSFER_DTYPE="int16", WAVE_PCM_SCALE=32768.0)
    tr = _one_device_trainer("pcmexact")
    rng = np.random.RandomState(0)
    ints = rng.randint(-32768, 32768, size=(2, 2, 256)).astype(np.float32)
    wire = tr._wire_cast(ints)  # raw-PCM-scale floats -> int16 wire
    assert wire.dtype == np.int16
    np.testing.assert_array_equal(wire.astype(np.float32), ints)
    # the jitted ingest dequantizes by WAVE_PCM_SCALE/32768 — on raw
    # PCM-scale data that reproduces the original samples exactly
    np.testing.assert_array_equal(
        wire.astype(np.float32) * (tr._pcm_scale / 32768.0), ints)


def test_int16_wire_scale_mismatch_raises(fresh_hparams):
    """synth-speech declares WAVE_SCALE=4.0 (crest factors past 1.0);
    running its int16 wire at the default WAVE_PCM_SCALE=1 would clip
    peaks — the trainer refuses instead of training on distorted audio."""
    from danet_tpu.data.synth_speech import SyntheticSpeechData
    hp = _hp(fresh_hparams, TRANSFER_DOMAIN="wave", TRANSFER_DTYPE="int16")
    ds = SyntheticSpeechData()
    ds.install_and_load()
    tr = _one_device_trainer("pcmmismatch")
    state = tr.init_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="WAVE_PCM_SCALE"):
        tr.train(1, ds, save_on_epoch=False, valid_on_epoch=False,
                 state=state)
    # with the declared scale configured, the same setup trains
    hp.WAVE_PCM_SCALE = 4.0
    tr2 = Trainer(DaNet(), name="pcmok",
                  mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    next(iter(tr2._epoch_fn(ds)("train", 4)))  # resolves without raising


def test_eval_sweeps_ship_f32_wire(fresh_hparams):
    """Quantized wires are a TRAIN throughput trade only: _put_batch
    with for_eval=True skips the bf16/int16 casts so valid/test metrics
    stay comparable to the f32-wire eval protocol."""
    _hp(fresh_hparams, TRANSFER_DTYPE="bfloat16")
    tr = _one_device_trainer("evalwire")
    x = np.random.RandomState(0).rand(2, 2, 8, 129, 2).astype(np.float32)
    assert str(tr._put_batch(x).dtype) == "bfloat16"         # train wire
    assert str(tr._put_batch(x, for_eval=True).dtype) == "float32"


def test_unknown_transfer_dtype_raises(fresh_hparams):
    _hp(fresh_hparams, TRANSFER_DTYPE="fp16")
    with pytest.raises(ValueError, match="TRANSFER_DTYPE"):
        _one_device_trainer("badwire")


def test_wave_mode_rejects_spectra_only_dataset(fresh_hparams):
    hp = _hp(fresh_hparams, TRANSFER_DOMAIN="wave")
    ds = WhiteNoiseData()
    ds.install_and_load()
    tr = _one_device_trainer()
    state = tr.init_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="wave-capable"):
        tr.train(1, ds, save_on_epoch=False, valid_on_epoch=False,
                 state=state)


def test_int16_requires_wave_domain(fresh_hparams):
    _hp(fresh_hparams, TRANSFER_DTYPE="int16")
    with pytest.raises(ValueError, match="int16"):
        _one_device_trainer()


def test_wave_wire_under_mesh_seq(fresh_hparams):
    """The wave wire composes with sequence parallelism: the wire batch
    is only data-sharded, the on-device STFT runs before the encoder's
    own 'seq' shard_map resharding — a MESH_SEQ=2 wave-wire train step
    matches the dense single-device spectra-wire step numerically."""
    from danet_tpu.train.trainer import effective_bucket
    hp = _hp(fresh_hparams, ENCODER_TYPE="bilstm-orig",
             MAX_TRAIN_LEN=None)
    hp.MESH_SEQ = 2
    ds = SyntheticTonesData()
    ds.install_and_load()
    bs = hp.BATCH_SIZE * hp.MAX_N_SIGNAL
    spec = next(iter(ds.epoch("train", bs)))[0]
    wave = next(iter(ds.epoch_wave("train", bs)))[0]
    bucket = effective_bucket(hp)

    # dense spectra reference on one device
    hp.MESH_SEQ = 1
    t_ref = Trainer(DaNet(), name="spref",
                    mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    state = t_ref.init_state(jax.random.PRNGKey(0))
    ref = jax.device_get(t_ref._valid_step(
        state["params"], t_ref._put_batch(prepare_batch(
            spec, hp.BATCH_SIZE, hp.MAX_N_SIGNAL, bucket=bucket))))

    hp.MESH_SEQ = 2
    hp.TRANSFER_DOMAIN = "wave"
    t_sp = Trainer(DaNet(), name="spwave",
                   mesh=make_mesh(1, 1, devices=jax.devices()[:2], n_seq=2))
    # host copies: the ref trainer's params are committed to a 1-device
    # mesh and must not leak that placement into the 2-device jit
    params_host = jax.tree_util.tree_map(np.asarray, state["params"])
    got = jax.device_get(t_sp._valid_step(
        params_host, t_sp._put_batch(prepare_batch_wave(
            wave, hp.BATCH_SIZE, hp.MAX_N_SIGNAL,
            hp.FFT_SIZE, hp.FFT_STRIDE, bucket=bucket))))
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-4, atol=2e-5,
                                   err_msg=k)
