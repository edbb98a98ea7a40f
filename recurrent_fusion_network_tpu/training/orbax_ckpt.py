"""Orbax-backed sharded checkpointing (multi-host / async).

The pickle triple files (checkpoint.py) match the reference's contract
(train.py:214-236) but gather every array to one host and write serially —
fine single-host, unusable for sharded params on a multi-host mesh. This
backend keeps the same logical layout (model / optimizer / infos per rank,
'-best' gating, 'rl_' prefix) on top of `orbax.checkpoint`:

  * each process writes ITS shards of sharded arrays (Orbax/TensorStore
    coordinates the global write) — params never gather to one host;
  * restore takes an optional pytree of `jax.sharding.NamedSharding`s and
    materializes arrays directly into them (resume onto a mesh without a
    host round-trip);
  * infos (plain python dict) ride along as msgpack-free JSON-compatible
    pickle inside the checkpoint directory.

Select with --checkpoint_backend orbax; the trainers otherwise keep the
pickle backend for reference-contract parity.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional, Tuple

import jax

# every process must call save_checkpoint (orbax runs cross-process
# barriers per save) — see checkpoint.backend()'s write discipline note
collective = True


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


_async_ckpts: dict = {}


def _async_checkpointer(kind: str):
    """Per-kind AsyncCheckpointer singletons (model/optimizer writes overlap
    each other AND training): the device->host copy happens before save()
    returns (donation-safe); the TensorStore write runs in the background.
    Registered with atexit so a finishing process never truncates an
    in-flight write."""
    if kind not in _async_ckpts:
        import orbax.checkpoint as ocp

        if not _async_ckpts:
            import atexit

            atexit.register(wait_until_finished)
        _async_ckpts[kind] = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckpts[kind]


def wait_until_finished():
    """Block until every in-flight async checkpoint write completes.

    The trainers call this when their loop ends (the reliable barrier); the
    atexit registration is a best-effort backstop and tolerates the executor
    already being shut down (threading's atexit hooks run before ours, so a
    write still in flight AT INTERPRETER EXIT cannot be completed — hence
    the in-loop barrier)."""
    for c in _async_ckpts.values():
        try:
            c.wait_until_finished()
        except RuntimeError as e:  # interpreter-shutdown race (atexit path)
            print(f"warning: async checkpoint wait failed at exit: {e}")


def _dir(checkpoint_path: str, run_id: str, rank: int, kind: str,
         best: bool, prefix: str) -> str:
    tag = f"{prefix}{kind}_{run_id}_{rank}" + ("-best" if best else "")
    return os.path.join(os.path.abspath(checkpoint_path), tag + ".orbax")


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
    async_save: bool = False,
):
    """Same logical surface as checkpoint.save_checkpoint, sharding-aware.
    async_save (--checkpoint_async): return once arrays are host-resident;
    the disk write continues in the background."""
    os.makedirs(checkpoint_path, exist_ok=True)

    def saver(kind):
        if not async_save:
            return _checkpointer()
        c = _async_checkpointer(kind)
        c.wait_until_finished()  # serialize with the prior save of this kind
        return c

    saver("model").save(
        _dir(checkpoint_path, run_id, rank, "model", best, prefix),
        params, force=True,
    )
    if opt_state is not None:
        saver("optimizer").save(
            _dir(checkpoint_path, run_id, rank, "optimizer", best, prefix),
            opt_state, force=True,
        )
    else:
        # retire any stale optimizer dir at this tag (see
        # checkpoint.save_checkpoint): a params-only save must not leave an
        # older run's moments paired with the fresh model
        stale = _dir(checkpoint_path, run_id, rank, "optimizer", best, prefix)
        if jax.process_index() == 0 and os.path.isdir(stale):
            import shutil

            shutil.rmtree(stale)
    # process-0 infos write assumes one REPLICATED logical checkpoint per
    # rank (the solo loops). Per-host per-rank fleet saves would lose
    # hosts>0's infos — which is why multi-host fleets refuse this backend
    # (multi_seed.py's collective-backend assert).
    if infos is not None and jax.process_index() == 0:
        tag = f"{prefix}infos_{run_id}_{rank}" + ("-best" if best else "")
        with open(os.path.join(checkpoint_path, tag + ".pkl"), "wb") as f:
            pickle.dump(infos, f)


def has_checkpoint(
    checkpoint_path: str,
    run_id: str,
    rank: int = 0,
    *,
    best: bool = True,
    prefix: str = "",
) -> bool:
    """True if this tag's model directory exists (existence probe, no
    restore). Waits for in-flight async writes first, like load."""
    wait_until_finished()
    return os.path.isdir(
        _dir(checkpoint_path, run_id, rank, "model", best, prefix)
    )


def load_checkpoint(
    checkpoint_path: str,
    run_id: str,
    rank: int = 0,
    *,
    best: bool = True,
    prefix: str = "",
    shardings=None,
    opt_state_shardings=None,
) -> Tuple[Any, Any, dict]:
    """Returns (params, opt_state_or_None, infos_or_{}).

    shardings / opt_state_shardings: optional pytrees of NamedSharding (or a
    single sharding applied to every leaf) — arrays restore directly into
    them, so a multi-host resume never materializes full arrays per host.
    """
    import orbax.checkpoint as ocp

    wait_until_finished()  # a reader must see completed writes
    ckpt = _checkpointer()

    def restore(path, shard_tree):
        if not os.path.isdir(path):
            return None
        if shard_tree is None:
            return ckpt.restore(path)
        meta = ckpt.metadata(path).item_metadata.tree
        if not isinstance(shard_tree, (dict, list, tuple)):
            shard_tree = jax.tree_util.tree_map(lambda _: shard_tree, meta)
        restore_args = jax.tree_util.tree_map(
            lambda _m, s: ocp.ArrayRestoreArgs(sharding=s), meta, shard_tree
        )
        return ckpt.restore(path, restore_args=restore_args)

    params = restore(
        _dir(checkpoint_path, run_id, rank, "model", best, prefix), shardings
    )
    if params is None:
        raise FileNotFoundError(
            _dir(checkpoint_path, run_id, rank, "model", best, prefix)
        )
    opt_state = restore(
        _dir(checkpoint_path, run_id, rank, "optimizer", best, prefix),
        opt_state_shardings,
    )
    tag = f"{prefix}infos_{run_id}_{rank}" + ("-best" if best else "")
    infos_path = os.path.join(checkpoint_path, tag + ".pkl")
    infos = {}
    if os.path.exists(infos_path):
        with open(infos_path, "rb") as f:
            infos = pickle.load(f)
    return params, opt_state, infos
