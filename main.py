"""Cross-entropy training entry point.

CLI equivalent of the reference's main.py + train.py, same flag surface
(see recurrent_fusion_network_tpu/config.py). The reference's Hogwild
`--async_opt` path (main.py:45-61) maps to synchronous data parallelism:
pass --num_dp_devices N to shard batches over an N-device mesh. Multi-seed
fleets (train_recurrent_fusion_model.sh) run vmapped in ONE program with
--n_seeds N (per-seed best checkpoints land under ranks 0..N-1), or as one
process per seed via scripts/. Combining --n_seeds S with --num_dp_devices D
shards the seed axis across the D devices (fleet-over-mesh: the one-job-per-
GPU fleet as one sharded program).

Example (synthetic smoke run):
  python main.py --caption_model recurrent_fusion_model \
      --feature_type feat_array --synthetic_features 1 \
      --input_json data/cocotalk.json --input_label_h5 data/cocotalk_label.npz \
      --batch_size 8 --max_epochs 1
"""

from recurrent_fusion_network_tpu.config import parse_opt
from recurrent_fusion_network_tpu.data.build import build_loader
from recurrent_fusion_network_tpu.training.train_loop import train


def main():
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # multi-host run: join the cluster BEFORE any backend use; the mesh
        # below then spans every process's devices and the loader shards the
        # input stream per host (parallel/distributed.py)
        from recurrent_fusion_network_tpu.parallel.distributed import initialize

        initialize()
    opt = parse_opt()
    loader = build_loader(opt, synthetic=bool(opt.synthetic_features))
    mesh = None
    if opt.async_opt and opt.num_dp_devices <= 1:
        # the reference's Hogwild path (main.py:45-61) maps to sync DP over
        # num_processes devices (SURVEY §2.5 — async shared-memory updates
        # have no TPU analogue; pmean of grads is the idiomatic superset)
        import jax

        opt.num_dp_devices = min(opt.num_processes, len(jax.devices()))
        print(f"--async_opt 1 -> synchronous DP over "
              f"{opt.num_dp_devices} device(s)")
    if opt.num_mp_devices > 1:
        # 2-D dp x mp: batch over dp, vocab-dim logit/embed over mp
        # (solo XE only: fleets shard the seed axis, and RL's rollout
        # readback is dp-sharded — see parallel/mesh.py)
        from recurrent_fusion_network_tpu.parallel.mesh import make_mesh_2d

        assert opt.n_seeds == 1, (
            "--num_mp_devices applies to solo XE runs; fleets (--n_seeds) "
            "shard the seed axis over dp instead"
        )
        mesh = make_mesh_2d(opt.num_dp_devices, opt.num_mp_devices)
    elif opt.num_dp_devices > 1:
        from recurrent_fusion_network_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(opt.num_dp_devices)
    try:
        max_it = opt.max_iterations if opt.max_iterations > 0 else None
        if opt.n_seeds > 1:
            from recurrent_fusion_network_tpu.training.multi_seed import (
                train_multi_seed,
            )

            # with a mesh, the SEED axis shards across devices
            # (fleet-over-mesh: one seed group per device)
            train_multi_seed(opt, loader, opt.n_seeds, max_iterations=max_it,
                             mesh=mesh)
        else:
            train(opt, loader, rank=0, mesh=mesh, max_iterations=max_it)
    finally:
        loader.close()


if __name__ == "__main__":
    main()
