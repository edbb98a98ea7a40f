"""Checkpoint save/load.

Mirrors the reference's triple-file contract per eval (train.py:214-236):

  infos_{id}_{rank}.pkl        — opt snapshot, iter/epoch, loader iterator
                                 state, histories, vocab, best score
  model_{id}_{rank}-best.pkl   — parameter pytree (numpy arrays)
  optimizer_{id}_{rank}-best.pkl — optax state pytree

plus non-best rolling copies. RL checkpoints are prefixed 'rl_'
(train_rl.py:262-272) via the `prefix` argument.

For multi-host / sharded checkpointing select the Orbax backend
(--checkpoint_backend orbax, training/orbax_ckpt.py) via `backend(opt)` —
same save/load surface, per-process shard writes, sharding-aware restore.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np


# Multi-host write discipline marker: pickle saves are plain host-side
# file writes — on a multi-host run with replicated params every process
# would race the SAME {path}.tmp on the shared checkpoint filesystem, so
# the solo training loops gate pickle saves to process 0. Orbax saves are
# COLLECTIVE (every process must call them — orbax runs cross-process
# barriers per save); backends advertise which they are via `collective`.
collective = False


def backend(opt=None):
    """Checkpoint module for opt.checkpoint_backend: this module ('pickle',
    the reference-contract default) or training.orbax_ckpt ('orbax')."""
    import sys

    name = getattr(opt, "checkpoint_backend", opt if isinstance(opt, str) else "pickle")
    if name == "orbax":
        from . import orbax_ckpt

        if getattr(opt, "checkpoint_async", 0):
            import functools
            import types

            return types.SimpleNamespace(
                save_checkpoint=functools.partial(
                    orbax_ckpt.save_checkpoint, async_save=True
                ),
                load_checkpoint=orbax_ckpt.load_checkpoint,
                has_checkpoint=orbax_ckpt.has_checkpoint,
                wait_until_finished=orbax_ckpt.wait_until_finished,
                collective=True,
            )
        return orbax_ckpt
    return sys.modules[__name__]


# Keys that determine the parameter TREE's structure/shapes: a mismatch
# between the CLI and a loaded checkpoint must fail with the reference's
# clear message (train.py need_be_same), not a deep KeyError/shape error —
# or worse, silently (a use_mos mismatch leaves a never-trained head in the
# tree and decodes garbage with no exception). Keys are checked only when
# the saved opt HAS them, so older checkpoints skip newer flags.
ARCH_KEYS = (
    "caption_model", "rnn_type", "rnn_size", "num_layers",
    "input_encoding_size", "att_hid_size", "use_mos",
    "num_review_steps", "num_review_steps_0", "tied_att_keys",
    "low_rank_ctx", "maxout", "review_maxout", "fusion_maxout",
)


def assert_arch_matches(opt, saved_opt: dict) -> None:
    for key in ARCH_KEYS:
        if key in saved_opt and saved_opt[key] != getattr(opt, key):
            # explicit raise, not `assert`: this guard must survive
            # python -O (it prevents SILENT wrong-graph loads)
            raise AssertionError(
                f"Command line argument and saved model disagree on '{key}' "
                f"(CLI {getattr(opt, key)!r} vs checkpoint {saved_opt[key]!r})"
            )


def adopt_structure(target, saved):
    """Fit a restored pytree into `target`'s structure.

    Pickle checkpoints round-trip optax NamedTuple states exactly; Orbax
    serializes them as plain containers, so a restored optimizer state is
    re-threaded onto the freshly-initialized state's treedef (leaf order is
    preserved by both backends). Shape mismatches raise.
    """
    t_leaves = jax.tree_util.tree_leaves(target)
    s_leaves = jax.tree_util.tree_leaves(saved)
    if jax.tree_util.tree_structure(saved) == jax.tree_util.tree_structure(target):
        return saved
    assert len(s_leaves) == len(t_leaves), "optimizer state mismatch"
    for a, b in zip(t_leaves, s_leaves):
        assert np.shape(a) == np.shape(b), (
            f"optimizer state mismatch: {np.shape(a)} vs {np.shape(b)}"
        )
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target), s_leaves
    )


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    checkpoint_path: str,
    run_id: str,
    rank: int,
    *,
    params,
    opt_state=None,
    infos: Optional[dict] = None,
    best: bool = False,
    prefix: str = "",
):
    os.makedirs(checkpoint_path, exist_ok=True)
    tag = f"{prefix}{{kind}}_{run_id}_{rank}" + ("-best" if best else "")

    def _dump(kind, obj):
        # atomic replace: a crash mid-write (OOM/preemption) must never
        # truncate the previous good checkpoint — especially the '-best' one
        path = os.path.join(checkpoint_path, tag.format(kind=kind) + ".pkl")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(obj, f)
        os.replace(tmp, path)

    _dump("model", _to_numpy(params))
    if opt_state is not None:
        _dump("optimizer", _to_numpy(opt_state))
    else:
        # the triple is a unit: a params-only save must also retire any
        # optimizer file a previous run left at this tag, or a later load
        # would pair the fresh model with stale moments (advisor r3 — e.g.
        # a never-improved RL seed warm-started from an optimizer-less XE
        # checkpoint shipping rl_model-best next to an old rl_optimizer-best)
        stale = os.path.join(
            checkpoint_path, tag.format(kind="optimizer") + ".pkl")
        if os.path.exists(stale):
            os.remove(stale)
    if infos is not None:
        _dump("infos", infos)


def has_checkpoint(
    checkpoint_path: str,
    run_id: str,
    rank: int = 0,
    *,
    best: bool = True,
    prefix: str = "",
) -> bool:
    """True if this tag's model file exists — an existence probe that never
    loads (flagship checkpoints are GBs; callers deciding whether a
    fallback snapshot is needed must not pay a read to find out)."""
    tag = f"{prefix}model_{run_id}_{rank}" + ("-best" if best else "")
    return os.path.exists(os.path.join(checkpoint_path, tag + ".pkl"))


def load_checkpoint(
    checkpoint_path: str,
    run_id: str,
    rank: int = 0,
    *,
    best: bool = True,
    prefix: str = "",
) -> Tuple[Any, Any, dict]:
    """Returns (params, opt_state_or_None, infos_or_{})."""
    tag = f"{prefix}{{kind}}_{run_id}_{rank}" + ("-best" if best else "")

    def _load(kind, required=False):
        p = os.path.join(checkpoint_path, tag.format(kind=kind) + ".pkl")
        if not os.path.exists(p):
            if required:
                raise FileNotFoundError(p)
            return None
        with open(p, "rb") as f:
            return pickle.load(f)

    params = _load("model", required=True)
    opt_state = _load("optimizer")
    infos = _load("infos") or {}
    return params, opt_state, infos
