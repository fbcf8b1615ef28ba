"""Checkpoint save/load (Orbax-backed).

Equivalent of the reference's tf.train.Saver flow
(/root/reference/main.py:192-206,399,461-477) with two deliberate fixes
(SURVEY.md §5): optimizer state IS checkpointed (the reference saves
trainable variables only, losing Adam moments on resume), and the learning
rate + epoch counter round-trip too.  The `-i/-o` CLI semantics and the
per-epoch `saves/<name>_e<i>` layout are preserved.
"""
from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abspath(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, state: dict) -> None:
    """Save a train-state pytree {params, opt_state, step, epoch, lr}."""
    path = _abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    if jax.process_count() == 1:
        # host-side numpy copy so no device sync issues on the tunnel
        state = jax.tree_util.tree_map(np.asarray, state)
    # multi-host: leave global arrays intact — np.asarray on a
    # non-fully-addressable array raises; Orbax gathers shards itself
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def _keystr(kp) -> str:
    return jax.tree_util.keystr(kp)


def _raise_mismatch(path, template, ckptr, orig) -> None:
    """A template restore failed — diagnose WHY with a user-actionable
    message (Orbax's own mismatch formatter crashes on array leaves:
    `truth value of an array is ambiguous`).  Compares the raw saved tree
    against the template leaf-by-leaf; falls back to re-raising the
    original error when nothing structural differs."""
    try:
        raw = ckptr.restore(path)
    except Exception:
        raise orig
    w_paths = jax.tree_util.tree_flatten_with_path(template)[0]
    g_leaves = jax.tree_util.tree_leaves(raw)
    if len(w_paths) != len(g_leaves):
        raise ValueError(
            "checkpoint %s holds %d leaves but the expected state has %d "
            "— different architecture/config? (e.g. a different "
            "ENCODER_TYPE or encoder dims than the checkpoint was "
            "trained with)" % (path, len(g_leaves), len(w_paths))
        ) from orig
    for (kp, w_leaf), g_leaf in zip(w_paths, g_leaves):
        if np.shape(w_leaf) != np.shape(g_leaf):
            raise ValueError(
                "checkpoint %s%s has shape %s but the expected state has "
                "%s — different architecture/config?"
                % (path, _keystr(kp), np.shape(g_leaf), np.shape(w_leaf))
            ) from orig
    raise orig


def load_checkpoint(path: str, template: dict, partial: bool = False) -> dict:
    """Restore a train-state pytree; template supplies structure/shapes.

    partial=True restores only the subtree present in the template
    (e.g. params-only consumers like the serving exporter)."""
    path = _abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree_util.tree_map(np.asarray, template)
    if partial:
        # restore the raw tree without a template, then select only the
        # template's top-level keys (this orbax version has no
        # partial_restore kwarg)
        full = ckptr.restore(path)
        missing = [k for k in template if k not in full]
        if missing:
            raise KeyError("checkpoint %s lacks keys %s" % (path, missing))
        state = {k: full[k] for k in template}
        # an untyped restore skips Orbax's template validation — check the
        # selected subtrees ourselves so a checkpoint from a different
        # architecture fails HERE with a clear message, not deep inside a
        # later trace
        for key, want in template.items():
            w_tree = jax.tree_util.tree_structure(want)
            g_tree = jax.tree_util.tree_structure(state[key])
            if w_tree != g_tree:
                raise ValueError(
                    "checkpoint %s[%r] tree structure %s does not match "
                    "the expected %s (different architecture/config?)"
                    % (path, key, g_tree, w_tree))
            for w_leaf, g_leaf in zip(jax.tree_util.tree_leaves(want),
                                      jax.tree_util.tree_leaves(state[key])):
                w_shape = np.shape(w_leaf)
                if w_shape != np.shape(g_leaf):
                    raise ValueError(
                        "checkpoint %s[%r] leaf shape %s != expected %s "
                        "(different architecture/config?)"
                        % (path, key, np.shape(g_leaf), w_shape))
                w_dtype = np.asarray(w_leaf).dtype
                g_dtype = np.asarray(g_leaf).dtype
                if w_dtype != g_dtype:
                    raise ValueError(
                        "checkpoint %s[%r] leaf dtype %s != expected %s "
                        "(different FLOATX/COMPUTE_DTYPE config?)"
                        % (path, key, g_dtype, w_dtype))
    else:
        try:
            state = ckptr.restore(path, template)
        except Exception as e:  # noqa: BLE001 — diagnose, then re-raise
            _raise_mismatch(path, template, ckptr, e)
    # counters round-trip as 0-d arrays; hand back python ints so consumers
    # (JSONL metrics writer, epoch arithmetic) see the template's types
    for key in ("step", "epoch"):
        if key in state:
            state[key] = int(state[key])
    return state
