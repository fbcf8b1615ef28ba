"""Module ABCs: Encoder / Estimator / Separator.

Functional counterparts of the reference's module abstractions
(/root/reference/app/modules.py:11-93).  A module is constructed from the
hyperparameter namespace and exposes:

  * ``init(rng) -> params``   — build its parameter pytree (may be ``{}``)
  * ``apply(params, ...) -> outputs`` — pure function of params + inputs

so the whole model is a pytree of arrays + pure functions, ready for
``jax.jit`` / ``pjit`` and ``jax.grad``.  Registration uses the same
decorator surface as the reference (``@hparams.register_encoder(name)`` ...).
"""
from __future__ import annotations


class ModelModule:
    """Base class for a sub-module (reference modules.py:11-25)."""

    def __init__(self, hp, name: str):
        self.hp = hp
        self.name = name
        self.debug_fetches = {}

    def init(self, rng):
        return {}

    def apply(self, params, *args, **kwargs):
        raise NotImplementedError()


class Encoder(ModelModule):
    """Maps log-magnitude spectra [B, T, F] to embeddings [B, T, F, E].

    (reference modules.py:28-50)

    ``apply`` accepts an optional ``tap(name, value)`` callback that
    encoders call with their internal activations (per-layer hidden
    sequences, conv activations, ...) — the functional replacement for the
    reference's ``debug_fetches`` side dicts (modules.py:19-20,375-377).
    """

    def apply(self, params, log_spectra, train=False, rng=None, tap=None):
        raise NotImplementedError()

    def sp_granularity(self) -> int:
        """Frame multiple the T axis must pad to under sequence
        parallelism (MESH_SEQ > 1), PER DEVICE CHUNK.  Segment-granular
        encoders override this (dprnn-v1 returns DPRNN_CHUNK) so the
        trainer's time-bucket padding (train/trainer.py::effective_bucket)
        sizes batches correctly without hardcoding encoder defaults."""
        return 1

    def apply_debug(self, params, log_spectra):
        """(embed, fetches): forward pass + dict of internal activations
        for the debug-mode .mat dump (reference main.py:387-397).

        User encoders that do not declare the optional ``tap`` kwarg
        still work — they just contribute no internal fetches."""
        import inspect
        sig = inspect.signature(self.apply).parameters
        takes_tap = "tap" in sig or any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.values())
        fetches = {}
        if takes_tap:
            embed = self.apply(params, log_spectra,
                               tap=fetches.__setitem__)
        else:
            embed = self.apply(params, log_spectra)
        return embed, fetches


class Estimator(ModelModule):
    """Estimates attractors [B, N, E] from embeddings (and, for USE_TRUTH
    estimators, ground-truth per-source power).  (reference modules.py:53-70)
    """

    USE_TRUTH = True

    def apply(self, params, embed, src_pwr=None, mix_pwr=None):
        raise NotImplementedError()


class Separator(ModelModule):
    """Computes per-source power spectra [B, N, T, F] from mixture power,
    attractors, and flat embeddings.  (reference modules.py:73-93)
    """

    def apply(self, params, mix_pwr, attractors, embed_flat):
        raise NotImplementedError()
