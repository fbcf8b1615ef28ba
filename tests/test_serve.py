"""AOT serving artifact tests: export -> deserialize -> numerical parity
with the live model, bucket padding/trimming, manifest validation.

The reference has no serving surface at all (demo mode only,
main.py:655-716); serve.py is the TPU-native production path.
"""
import json
import os

import jax
import numpy as np
import pytest

from danet_tpu.hparams import hparams
from danet_tpu import serve


@pytest.fixture()
def tiny_model():
    import danet_tpu  # noqa: F401 (registries)
    from danet_tpu.models import DaNet
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hparams.load_json(os.path.join(repo, "default.json"))
    hparams.ENCODER_TYPE = "toy"
    hparams.BATCH_SIZE = 1
    hparams.digest()
    model = DaNet()
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_export_roundtrip_matches_live_model(tiny_model, tmp_path):
    model, params = tiny_model
    out_dir = str(tmp_path / "artifact")
    manifest = serve.export_separator(
        model, params, out_dir, lengths=[4096, 8192], batch=1)
    assert manifest["lengths"] == [4096, 8192]
    assert os.path.exists(os.path.join(out_dir, "manifest.json"))

    bundle = serve.load_separator(out_dir)
    assert bundle.lengths == [4096, 8192]

    wav = np.random.RandomState(0).randn(3000).astype(np.float32) * 0.1
    got = bundle.separate(wav)
    assert got.shape[0] == hparams.MAX_N_SIGNAL
    assert got.shape[1] <= 3000

    # live model on the same zero-padded bucket must match exactly
    padded = np.zeros((1, 4096), dtype=np.float32)
    padded[0, :3000] = wav
    want = np.asarray(jax.jit(
        lambda w: model.separate_wav(params, w))(padded))[0]
    np.testing.assert_allclose(got, want[:, :got.shape[1]],
                               rtol=1e-5, atol=1e-6)


def test_bucket_selection_and_errors(tiny_model, tmp_path):
    model, params = tiny_model
    out_dir = str(tmp_path / "artifact")
    serve.export_separator(model, params, out_dir, lengths=[4096], batch=1)
    bundle = serve.load_separator(out_dir)

    with pytest.raises(ValueError, match="exceeds the largest"):
        bundle.separate(np.zeros(10000, dtype=np.float32))
    with pytest.raises(ValueError, match="batch=1"):
        bundle.separate(np.zeros((2, 1000), dtype=np.float32))
    # batched rank-2 request of the exported batch size works
    out = bundle.separate(np.zeros((1, 1000), dtype=np.float32))
    assert out.ndim == 3 and out.shape[0] == 1


def test_manifest_format_guard(tmp_path):
    os.makedirs(tmp_path / "bad", exist_ok=True)
    with open(tmp_path / "bad" / "manifest.json", "w") as f:
        json.dump({"format": "something-else"}, f)
    with pytest.raises(ValueError, match="not a danet-tpu serving"):
        serve.load_separator(str(tmp_path / "bad"))
