"""Test harness: force the CPU backend with an 8-device virtual mesh.

The axon sitecustomize hook registers the TPU backend in every process, so
JAX_PLATFORMS env alone is not enough — we also flip jax_platforms after
import (see .claude/skills/verify/SKILL.md).  All tests run on
8 virtual CPU devices so DP/TP collective paths are exercised without TPU
hardware (SURVEY.md §4 implication).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import copy  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def fresh_hparams():
    """Load default.json into the singleton and restore it after each test
    (hparams is process-global, like the reference's)."""
    from danet_tpu.hparams import hparams
    import danet_tpu  # noqa: F401  (registries)
    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "default.json")
    saved = copy.copy(hparams.__dict__)
    hparams.load_json(base)
    hparams.digest()
    yield hparams
    hparams.__dict__.clear()
    hparams.__dict__.update(saved)
    from danet_tpu.parallel import set_active_mesh
    set_active_mesh(None)  # Trainer-registered meshes must not leak
