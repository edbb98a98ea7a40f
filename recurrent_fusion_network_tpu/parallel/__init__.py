"""Parallelism: device mesh + sharding helpers (DP over ICI).

Replaces the reference's process-level parallelism — the Hogwild/A3C
shared-memory path (main.py:45-61, my_optim.py) and the 8-seed bash fleet
(train_recurrent_fusion_model.sh) — with synchronous data parallelism over a
`jax.sharding.Mesh`: batches sharded on the 'dp' axis, parameters replicated,
gradient reductions compiled by XLA onto ICI collectives.
"""

from .mesh import make_mesh, shard_batch_spec, with_dp_sharding  # noqa: F401
