"""Device mesh + sharding helpers.

The training-parallelism design (scaling-book recipe): pick a mesh, annotate
input shardings, let XLA's GSPMD partitioner insert the collectives. For this
workload — 512-dim RNNs over precomputed CNN features — the right first axis
is pure data parallelism ('dp'): parameters replicated, the (B*seq_per_img)
batch dimension sharded, gradient all-reduce riding ICI. Tensor/pipeline axes
are unnecessary at this model scale (SURVEY.md §2.5); the ensemble/multi-seed
use cases vectorize with vmap instead.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        assert n_devices <= len(devs), f"need {n_devices} devices, have {len(devs)}"
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("dp",))


def shard_batch_spec(mesh: Mesh):
    """Sharding for batch-leading arrays: rows split across 'dp'."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def with_dp_sharding(mesh: Mesh, tree):
    """device_put every leaf with its batch axis sharded across 'dp'."""
    sharding = shard_batch_spec(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


# --------------------------------------------------------------- 2-D dp x mp


def make_mesh_2d(dp: int, mp: int, devices: Optional[Sequence] = None) -> Mesh:
    """('dp', 'mp') mesh: batch sharded over dp, the widest parameters
    (vocab-dim projections) sharded over mp. At this model's 512-dim core TP
    is optional (SURVEY §2.5), but the vocab projection (rnn x V+1) and token
    embedding are the largest matmuls and shard cleanly."""
    devs = list(devices if devices is not None else jax.devices())
    assert dp * mp <= len(devs), f"need {dp * mp} devices, have {len(devs)}"
    return Mesh(np.array(devs[: dp * mp]).reshape(dp, mp), ("dp", "mp"))


def is_mesh_2d(mesh) -> bool:
    """True when the mesh carries a non-trivial 'mp' (tensor) axis."""
    return (
        mesh is not None
        and "mp" in getattr(mesh, "axis_names", ())
        and mesh.shape["mp"] > 1
    )


def shard_params_2d(mesh: Mesh, params):
    """device_put params with vocab-dim sharding over 'mp':

      logit w (R, V+1) -> P(None, 'mp');  logit b (V+1,) -> P('mp')
      embed   (V+1, E) -> P('mp', None)

    everything else replicated. GSPMD inserts the all-gathers/reductions
    (e.g. the log-softmax over the sharded vocab axis) automatically.
    """
    rep = replicated(mesh)
    out = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)
    if isinstance(out, dict) and "logit" in out and "embed" in out:
        out = dict(out)
        out["logit"] = {
            "w": jax.device_put(params["logit"]["w"], NamedSharding(mesh, P(None, "mp"))),
            "b": jax.device_put(params["logit"]["b"], NamedSharding(mesh, P("mp"))),
        }
        out["embed"] = jax.device_put(params["embed"], NamedSharding(mesh, P("mp", None)))
    return out


def shard_opt_state_2d(mesh: Mesh, opt_state, params_template, sharded_params):
    """Place an optax state on a 2-D mesh, mirroring the parameter shardings
    onto every params-shaped subtree (adam's mu/nu moments share the param
    treedef — a moment must live WITH its weight shard or every step pays an
    all-gather); scalar leaves (step counts) replicate."""
    p_struct = jax.tree_util.tree_structure(params_template)
    shardings = jax.tree_util.tree_map(lambda x: x.sharding, sharded_params)
    rep = replicated(mesh)

    def params_shaped(node):
        try:
            return jax.tree_util.tree_structure(node) == p_struct
        except Exception:
            return False

    def place(node):
        if params_shaped(node):
            return jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, s), node, shardings
            )
        return jax.device_put(node, rep)

    return jax.tree_util.tree_map(place, opt_state, is_leaf=params_shaped)
