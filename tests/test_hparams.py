"""Config/registry layer tests (reference surface: app/hparams.py)."""
import json

import numpy as np
import pytest
import scipy.signal

from danet_tpu.hparams import WINDOW_REGISTRY, Hyperparameter, hparams


def test_digest_derivations(fresh_hparams):
    hp = fresh_hparams
    assert hp.COMPLEXX == "complex64"
    assert hp.FEATURE_SIZE == 1 + hp.FFT_SIZE // 2 == 129
    assert hp.FFT_WND_ARRAY.shape == (hp.FFT_SIZE,)
    assert hp.FFT_WND_ARRAY.dtype == np.float32


def test_window_matches_scipy_sqrt_hann(fresh_hparams):
    # reference default.json:7 evaluates np.sqrt(scipy.signal.hann(N))
    ref = np.sqrt(scipy.signal.get_window("hann", 256, fftbins=False))
    np.testing.assert_allclose(
        WINDOW_REGISTRY["sqrt-hann"](256), ref, atol=1e-12)


def test_load_rejects_bad_keys(fresh_hparams):
    with pytest.raises(NameError):
        fresh_hparams.load({"lower_case": 1})
    with pytest.raises(AssertionError):
        fresh_hparams.load({"SOMEKEY": [1, 2, 3]})


def test_unknown_window_rejected(fresh_hparams):
    fresh_hparams.FFT_WND = "nope"
    with pytest.raises(KeyError):
        fresh_hparams.digest()


def test_layered_override(tmp_path, fresh_hparams):
    override = tmp_path / "override.json"
    override.write_text(json.dumps({"FFT_SIZE": 512, "BATCH_SIZE": 4}))
    fresh_hparams.load_json(str(override))
    fresh_hparams.digest()
    assert fresh_hparams.FFT_SIZE == 512
    assert fresh_hparams.FEATURE_SIZE == 257
    assert fresh_hparams.BATCH_SIZE == 4
    # untouched keys keep their defaults
    assert fresh_hparams.FFT_STRIDE == 64


def test_registries_resolve(fresh_hparams):
    for key in ["toy", "lstm-orig", "bilstm-orig", "conv-bilstm-v1"]:
        assert fresh_hparams.get_encoder(key) is not None
    for key in ["truth", "truth-threshold", "truth-weighted", "anchor"]:
        assert fresh_hparams.get_estimator(key) is not None
    for key in ["dot-sigmoid-orig", "dot-softmax-orig"]:
        assert fresh_hparams.get_separator(key) is not None
    for key in ["sgd", "adam"]:
        assert Hyperparameter.ozer_registry[key] is not None
    for key in ["toy", "timit", "wsj0"]:
        assert Hyperparameter.dataset_registry[key] is not None
    with pytest.raises(KeyError):
        fresh_hparams.get_encoder("does-not-exist")


def test_custom_registration(fresh_hparams):
    @Hyperparameter.register_encoder("test-custom-enc")
    class MyEnc:
        pass

    assert fresh_hparams.get_encoder("test-custom-enc") is MyEnc
    del Hyperparameter.encoder_registry["test-custom-enc"]


def test_apply_overrides(fresh_hparams, capsys):
    """CLI --set plumbing: JSON typing, missing '=' rejected, unknown
    keys warn, key-regex/scalar validation still applies."""
    from danet_tpu.hparams import apply_overrides
    hp = fresh_hparams
    apply_overrides(hp, ["TCN_BLOCKS=5", "TCN_CAUSAL=true",
                         "SUMMARY_TITLE=plain string"])
    assert hp.TCN_BLOCKS == 5 and hp.TCN_CAUSAL is True
    assert hp.SUMMARY_TITLE == "plain string"
    with pytest.raises(ValueError, match="KEY=VALUE"):
        apply_overrides(hp, ["TCN_BLOCKS"])
    with pytest.raises(NameError):          # key regex (lowercase)
        apply_overrides(hp, ["tcn_blocks=5"])
    capsys.readouterr()
    apply_overrides(hp, ["TCN_BLOCK=5"])    # typo'd key: loud warning
    assert "TCN_BLOCK" in capsys.readouterr().err
