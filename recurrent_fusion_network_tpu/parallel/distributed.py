"""Multi-host (multi-process) scaffolding.

The reference is strictly single-host (SURVEY §2.5: no NCCL/MPI anywhere;
its only cross-process transport is shared memory and pipes). The TPU-native
equivalent of "more hosts" is a multi-process JAX runtime: one process per
host, `jax.distributed.initialize` for the coordination plane, a GLOBAL mesh
over all processes' devices, per-host input shards assembled into global
arrays, and XLA collectives riding ICI within a slice / DCN across slices.

Pieces:
  initialize()            — env/args wrapper over jax.distributed.initialize
  global_dp_mesh()        — 1-D 'dp' mesh over every device of every process
  global_dp_batch(mesh,t) — turn per-process batch shards into global arrays
                            (jax.make_array_from_process_local_data); on a
                            single process this is plain dp device_put
  host_shard()            — (process_index, process_count) for the DataLoader
                            `host_shard` argument so each host loads only its
                            slice of the global batch

Axis-layout note (scaling-book recipe): keep the mesh-major axis over ICI
(devices within a slice are contiguous in jax.devices()) and the
process/slice axis outer-most so gradient all-reduces decompose into
intra-slice ICI reductions followed by a small inter-slice DCN phase — this
is what GSPMD emits for a 1-D dp mesh ordered by process.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-process runtime. Arguments fall back to the standard
    env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID,
    or the cloud-TPU metadata autodetection when none are set)."""
    kw = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kw["coordinator_address"] = addr
    n = num_processes if num_processes is not None else os.environ.get("JAX_NUM_PROCESSES")
    if n is not None:
        kw["num_processes"] = int(n)
    pid = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kw["process_id"] = int(pid)
    if local_device_ids is not None:
        kw["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kw)


def host_shard():
    """(process_index, process_count) — the DataLoader host_shard tuple."""
    return jax.process_index(), jax.process_count()


def global_dp_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D 'dp' mesh over ALL devices (every process's). jax.devices() is
    ordered process-major, so the dp axis decomposes into intra-process
    (ICI) segments with the inter-process (DCN) dimension outermost."""
    devs = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devs), ("dp",))


def global_dp_batch(mesh: Mesh, tree):
    """Assemble per-process local batch shards into global dp-sharded arrays.

    Each process passes ITS rows only (batch leading axis = global_rows /
    process_count); the result behaves like one global array of the full
    batch. Single-process meshes take the plain device_put path.
    """
    sharding = NamedSharding(mesh, P("dp"))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree,
    )


def host_mean(value: float, weight: float = 1.0) -> float:
    """Collective WEIGHTED mean of a per-process scalar (identity
    single-process; with every weight 0 the result is 0.0).

    Periodic eval on multi-host runs scores each host's LOCAL slice of the
    host-sharded val stream (eval_split docstring), so best-checkpoint
    gating on the raw local score would diverge across hosts — different
    hosts would then issue different numbers of (collective) checkpoint
    saves, deadlocking the orbax barrier or splitting pickle history state.
    Pass each host's scored-image count as `weight`: the budget trim can
    leave hosts with UNEQUAL (even zero) image counts when the limit cuts
    mid-batch, and only the count-weighted mean equals the global per-image
    score (CIDEr is a per-image mean; -val_loss a mean of batch means).
    Call-count discipline as all_hosts_agree.
    """
    if jax.process_count() == 1:
        return float(value) if weight else 0.0
    from jax.experimental import multihost_utils

    pair = multihost_utils.process_allgather(
        np.asarray([value * weight, weight], np.float64)
    )
    total_w = float(np.sum(pair[..., 1]))
    return float(np.sum(pair[..., 0]) / total_w) if total_w else 0.0


def all_hosts_agree(flag: bool) -> bool:
    """Collective AND over per-process booleans (True only when EVERY
    process reports True). Single-process: identity, no collective.

    Used for loop-exit decisions that must stay collective on multi-host
    runs (early stop, fleet stagnation): a host breaking out of a training
    loop on a host-local verdict deadlocks its peers inside the next
    collective step. Every process must call this the same number of times
    — the training loops do, since their boundary checks run in lockstep.
    """
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.int32(bool(flag)))
    return bool(np.min(flags))
