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


def _restore_ema_compat(path, template, ckptr, orig) -> dict:
    """EMA checkpoint compatibility (both directions): a pre-EMA checkpoint
    restored under EMA_DECAY>0 lacks the 'ema' subtree — re-seed it from
    the restored params (the EMA restarts from the resume point); an EMA
    checkpoint restored under EMA_DECAY=0 carries an extra 'ema' — restore
    and drop it.  Any other mismatch falls through to the structural
    diagnosis so genuine architecture/config errors still read as such."""
    if isinstance(template, dict) and "params" in template:
        if "ema" in template:
            t2 = {k: v for k, v in template.items() if k != "ema"}
            try:
                state = ckptr.restore(path, t2)
            except Exception:
                _raise_mismatch(path, template, ckptr, orig)
            state["ema"] = jax.tree_util.tree_map(
                np.copy, state["params"])
            return state
        t2 = dict(template, ema=template["params"])
        try:
            state = ckptr.restore(path, t2)
        except Exception:
            _raise_mismatch(path, template, ckptr, orig)
        state.pop("ema")
        return state
    _raise_mismatch(path, template, ckptr, orig)


def _restore_optstate_compat(path, template, ckptr):
    """Optimizer-state chain compatibility (ADVICE r3): checkpoints
    written before the clip transform became unconditionally first in the
    optax chain (optim.py::_with_clip_and_lr) saved a 1-tuple chain state
    when GRAD_CLIP_THRES was null; the live tree is now a 2-tuple with a
    leading EmptyState.  The missing element is stateless — restore
    against a template without it and re-prepend the EmptyState.
    Returns None when this shim does not apply (caller falls through to
    the EMA/structural diagnosis)."""
    import optax
    opt = template.get("opt_state") if isinstance(template, dict) else None
    if not (isinstance(opt, tuple) and len(opt) >= 2
            and isinstance(opt[0], optax.EmptyState)):
        return None
    t2 = dict(template, opt_state=opt[1:])
    try:
        state = ckptr.restore(path, t2)
    except Exception:  # noqa: BLE001 — not a 1-tuple checkpoint either
        return None
    state["opt_state"] = (optax.EmptyState(),) + tuple(state["opt_state"])
    return state


def load_eval_params(path: str, params_template):
    """Restore the weights inference/serving should run on: the EMA
    (Polyak) average when the checkpoint carries one, raw params
    otherwise.  Counterpart of Trainer.eval_params for params-only
    consumers (the serving exporter, eval scripts).  ONE full restore:
    the key choice is made on the restored tree, not by retrying
    whole-checkpoint loads per candidate key."""
    path = _abspath(path)
    full = ocp.StandardCheckpointer().restore(path)
    key = "ema" if "ema" in full else "params"
    template = jax.tree_util.tree_map(np.asarray, {key: params_template})
    return _select_checked(full, template, path)[key]


def _select_checked(full: dict, template: dict, path: str) -> dict:
    """Select the template's top-level keys out of an untyped restore and
    validate each subtree's structure/shapes/dtypes (the untyped restore
    skips Orbax's template validation — check ourselves so a checkpoint
    from a different architecture fails HERE with a clear message, not
    deep inside a later trace)."""
    missing = [k for k in template if k not in full]
    if missing:
        raise KeyError("checkpoint %s lacks keys %s" % (path, missing))
    state = {k: full[k] for k in template}
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
    return state


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
        state = _select_checked(ckptr.restore(path), template, path)
    else:
        try:
            state = ckptr.restore(path, template)
        except Exception as e:  # noqa: BLE001 — reconcile compat or diagnose
            state = _restore_optstate_compat(path, template, ckptr)
            if state is None:
                state = _restore_ema_compat(path, template, ckptr, e)
    # counters round-trip as 0-d arrays; hand back python ints so consumers
    # (JSONL metrics writer, epoch arithmetic) see the template's types
    for key in ("step", "epoch"):
        if key in state:
            state[key] = int(state[key])
    return state
