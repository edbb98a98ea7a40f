"""Multi-host (multi-process) scaffolding tests.

The reference has no distributed runtime at all (SURVEY §2.5); the TPU-native
framework adds one: jax.distributed initialization, a global mesh over every
process's devices, and per-host input sharding in the DataLoader. These tests
validate the full multi-host XE path on a 2-process CPU cluster (2 local
devices each -> 4 global) against the single-process result — the
hardware-free-distributed-test pattern of SURVEY §4.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.quick


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestHostShardedLoader:
    def test_shards_partition_the_global_batch(self):
        """Hosts walking the same stream must produce disjoint contiguous
        blocks whose concatenation equals the unsharded batch."""
        from recurrent_fusion_network_tpu.data.loader import DataLoader
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup

        opt, base = synthetic_setup(caption_model="show_tell", batch_size=8,
                                    seq_per_img=2)
        loaders = [
            DataLoader(opt, base.dataset, base.sources, prefetch=False,
                       host_shard=(k, 2))
            for k in range(2)
        ]
        full = DataLoader(opt, base.dataset, base.sources, prefetch=False)
        for _ in range(3):  # across epoch wrap + shuffles
            parts = [ld.get_batch("train") for ld in loaders]
            whole = full.get_batch("train")
            np.testing.assert_array_equal(
                np.concatenate([p["labels"] for p in parts]), whole["labels"]
            )
            np.testing.assert_allclose(
                np.concatenate([p["fc_feats"] for p in parts]),
                whole["fc_feats"],
            )
            assert [i["id"] for p in parts for i in p["infos"]] == [
                i["id"] for i in whole["infos"]
            ]
            # iterator state stays in lockstep
            assert parts[0]["bounds"] == parts[1]["bounds"] == whole["bounds"]

    def test_eval_split_on_host_sharded_loader(self):
        """Per-host eval over a host-sharded loader must dedupe with the
        LOCAL image count: each host captions exactly its block and the two
        hosts' predictions concatenate to the unsharded host's (regression:
        dedupe previously used the GLOBAL batch size, duplicating clamped
        rows then crashing on infos indexing)."""
        import jax

        from recurrent_fusion_network_tpu.data.loader import DataLoader
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.models import setup
        from recurrent_fusion_network_tpu.training.eval_split import eval_split

        opt, base = synthetic_setup(caption_model="show_tell", batch_size=8,
                                    seq_per_img=2)
        opt.vocab_size, opt.seq_length = base.vocab_size, base.seq_length
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))

        full = DataLoader(opt, base.dataset, base.sources, prefetch=False)
        _, preds_full, _ = eval_split(model, params, full, opt, split="val",
                                      val_images_use=16,
                                      language_eval_flag=False)
        parts = []
        for k in range(2):
            ld = DataLoader(opt, base.dataset, base.sources, prefetch=False,
                            host_shard=(k, 2))
            _, preds, _ = eval_split(model, params, ld, opt, split="val",
                                     val_images_use=16,
                                     language_eval_flag=False)
            parts.append(preds)
        # interleave per batch: host0 rows then host1 rows, batch by batch
        got = []
        for b in range(len(parts[0]) // 4):
            got += parts[0][b * 4:(b + 1) * 4] + parts[1][b * 4:(b + 1) * 4]
        assert [p["image_id"] for p in got] == \
            [p["image_id"] for p in preds_full]
        assert [p["caption"] for p in got] == \
            [p["caption"] for p in preds_full]

    def test_batch_must_divide_by_hosts(self):
        from recurrent_fusion_network_tpu.data.loader import DataLoader
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup

        opt, base = synthetic_setup(caption_model="show_tell", batch_size=5)
        ld = DataLoader(opt, base.dataset, base.sources, prefetch=False,
                        host_shard=(0, 2))
        # ValueError, not a strippable assert: under `python -O` a stripped
        # check would silently drop the tail rows of every global batch
        with pytest.raises(ValueError, match="divide"):
            ld.get_batch("train")


def _run_cluster(mode, n=2, extra=()):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "PALLAS_AXON_POOL_IPS")}  # no TPU-tunnel touch
    # from CPU-pinned cluster workers (retries hang when the pool is down)
    # the worker imports the package by repo-relative name; python only puts
    # the script's own directory (tests/) on sys.path in a subprocess
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(k), str(n), str(port), mode,
             *map(str, extra)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for k in range(n)
    ]
    outs = []
    prefix = "PREDS:" if mode == "eval" else "LOSSES:"
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith(prefix)][-1]
        outs.append(json.loads(line[len(prefix):]))
    return outs


class TestTwoProcessCluster:
    def test_dp_train_matches_single_process(self, tmp_path):
        """2 processes x 2 CPU devices, global 4-device dp mesh, host-sharded
        input: every process sees the identical loss trajectory, equal to a
        single-process 4-device run on the same stream."""
        outs = _run_cluster("xe")
        # both processes observe the same (global) losses
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)

        # reference: single process, 4 virtual devices, same stream
        from recurrent_fusion_network_tpu.data.loader import DataLoader
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.parallel.mesh import make_mesh
        from recurrent_fusion_network_tpu.training.train_loop import train

        opt, base = synthetic_setup(caption_model="show_tell", batch_size=8,
                                    seq_per_img=2)
        opt.checkpoint_path = str(tmp_path)
        opt.losses_log_every = 1
        loader = DataLoader(opt, base.dataset, base.sources, prefetch=False)
        infos = train(opt, loader, max_iterations=3, mesh=make_mesh(4),
                      log_fn=lambda *a, **k: None)
        # cross-process allreduce (gloo) reduces in a different order than
        # the single-process fused reduction: f32 noise ~2e-4 after 3 steps
        np.testing.assert_allclose(
            outs[0], list(infos["loss_history"].values()), rtol=1e-3
        )

    def test_cluster_eval_covers_every_image_once(self):
        """Real 2-process cluster eval: each host captions exactly ITS local
        block (the multi-host eval dedupe fix), and the hosts' predictions
        interleave per batch to the single-process reference."""
        outs = _run_cluster("eval")
        # the fixture's 8 val images / 2 hosts -> 4 predictions each,
        # no overlap (the pre-fix dedupe produced clamped duplicates here)
        assert len(outs[0]) == len(outs[1]) == 4
        ids0 = [p["image_id"] for p in outs[0]]
        ids1 = [p["image_id"] for p in outs[1]]
        assert not (set(ids0) & set(ids1))

        # single-process reference on the same stream/params
        import jax

        from recurrent_fusion_network_tpu.data.loader import DataLoader
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.models import setup
        from recurrent_fusion_network_tpu.training.eval_split import eval_split

        opt, base = synthetic_setup(caption_model="show_tell", batch_size=8,
                                    seq_per_img=2)
        opt.vocab_size, opt.seq_length = base.vocab_size, base.seq_length
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        loader = DataLoader(opt, base.dataset, base.sources, prefetch=False)
        _, preds_full, _ = eval_split(model, params, loader, opt, split="val",
                                      val_images_use=16, beam_size=2,
                                      language_eval_flag=False)
        got = outs[0] + outs[1]  # one batch: host0's block then host1's
        assert [p["image_id"] for p in got] == \
            [p["image_id"] for p in preds_full]
        assert [p["caption"] for p in got] == \
            [p["caption"] for p in preds_full]

    def test_preemption_on_one_host_stops_both_collectively(self, tmp_path):
        """SIGTERM lands on host 1 only (simulated flag); guard.sync()'s
        allgather must trip BOTH hosts at the same iteration boundary — a
        host stopping alone would deadlock the other inside the next
        collective step (and this test would time out). Write discipline:
        pickle saves go through ONE writer (process 0) — on a shared FS
        every process would race the same {path}.tmp — so host 0 saves and
        host 1 must not."""
        import pickle

        outs = _run_cluster("preempt", extra=(str(tmp_path),))
        # both hosts stopped at the same (early) boundary
        assert outs[0]["iter"] == outs[1]["iter"] < 50
        p = tmp_path / "h0" / "infos_mhp_0.pkl"
        with open(p, "rb") as f:
            infos = pickle.load(f)
        assert infos["iter"] == outs[0]["iter"]
        assert os.path.exists(tmp_path / "h0" / "model_mhp_0.pkl")
        # one writer: the non-zero process wrote nothing
        assert not os.path.exists(tmp_path / "h1" / "model_mhp_0.pkl")
        assert not os.path.exists(tmp_path / "h1" / "infos_mhp_0.pkl")

    def test_eval_verdict_is_host_agreed(self, tmp_path):
        """Periodic-eval best gating on multi-host: each host's LOCAL val
        slice scores differently, yet best_val_score / num_period_best must
        come out identical on every host (host_mean'd score) — hosts
        diverging here would issue different numbers of collective
        checkpoint saves (orbax barrier deadlock). Pickle writes come from
        process 0 only."""
        outs = _run_cluster("evalagree", extra=(str(tmp_path),))
        # the raw local scores really did diverge (the test is vacuous
        # otherwise) ...
        assert outs[0]["local_losses"] != outs[1]["local_losses"]
        # ... but the agreed verdict state is identical
        assert outs[0]["best"] == outs[1]["best"] is not None
        assert outs[0]["npb"] == outs[1]["npb"] is not None
        assert outs[0]["iter"] == outs[1]["iter"]
        # one writer: process 0 has the triple files, process 1 nothing
        assert os.path.exists(tmp_path / "h0" / "model_mha_0.pkl")
        assert not os.path.exists(tmp_path / "h1" / "model_mha_0.pkl")

    def test_dp_rl_runs_with_local_reward_scoring(self):
        """Multi-host SCST executes end-to-end: each host scores ITS rollout
        rows against its local gts, the policy-gradient step runs on the
        global mesh, and the per-host average rewards are finite and on the
        CIDEr-D scale. (Exact trajectory equality across topologies does NOT
        hold for SAMPLED rollouts — f32 matmul partitioning differences flip
        individual multinomial draws — so cross-topology reward comparisons
        are deliberately not asserted.)"""
        outs = _run_cluster("rl")
        assert len(outs) == 2 and all(len(o) == 3 for o in outs)
        for o in outs:
            assert all(np.isfinite(o)), o
            assert all(abs(v) < 10.0 for v in o), o  # CIDEr-D advantage scale
        # hosts score DIFFERENT local rows -> partial averages differ
        assert outs[0] != outs[1]


class TestLocalRows:
    def test_local_rows_orders_shards(self):
        """_local_rows gathers a dp-sharded array's addressable shards in
        row order (the multi-host reward-scoring primitive; single-process
        8-device mesh makes every shard addressable)."""
        import jax

        from recurrent_fusion_network_tpu.parallel.mesh import (
            make_mesh,
            shard_batch_spec,
        )
        from recurrent_fusion_network_tpu.training.train_rl_loop import (
            _local_rows,
        )

        mesh = make_mesh(8)
        x = np.arange(16 * 3).reshape(16, 3).astype(np.int32)
        xs = jax.device_put(x, shard_batch_spec(mesh))
        np.testing.assert_array_equal(_local_rows(xs), x)


class TestMultiHostFleet:
    def test_fleet_seed_trajectories_match_single_process(self, tmp_path):
        """2-process fleet-over-mesh (4 seeds, 2 hosts x 2 devices): hosts
        own disjoint seed blocks covering the fleet, and every seed's XE
        loss trajectory equals the single-process vmapped fleet on the same
        stream (VERDICT r2 item 2: the fleet formerly asserted
        process_count()==1)."""
        outs = _run_cluster("fleet")
        owned = [sorted(int(r) for r in o) for o in outs]
        assert owned[0] == [0, 1] and owned[1] == [2, 3]

        from recurrent_fusion_network_tpu.data.loader import DataLoader
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.training.multi_seed import (
            train_multi_seed,
        )

        opt, base = synthetic_setup(caption_model="show_tell", batch_size=8,
                                    seq_per_img=2)
        opt.checkpoint_path = str(tmp_path)
        opt.losses_log_every = 1
        opt.save_checkpoint_every = 10**9
        loader = DataLoader(opt, base.dataset, base.sources, prefetch=False)
        ref = train_multi_seed(opt, loader, 4, max_iterations=3,
                               eval_at_end=False, save=False,
                               log_fn=lambda *a, **k: None)
        for o in outs:
            for r_str, hist in o.items():
                got = [hist[str(i)] for i in range(3)]
                want = [ref["loss_histories"][int(r_str)][i]
                        for i in range(3)]
                np.testing.assert_allclose(got, want, rtol=1e-4,
                                           err_msg=f"seed {r_str}")

    def test_fleet_rl_runs_multi_host(self):
        """Multi-host SCST fleet executes end-to-end: per-host local-seed
        reward scoring, global-mesh policy step, finite reward histories on
        the CIDEr-D scale for every owned seed."""
        outs = _run_cluster("fleetrl")
        owned = [sorted(int(r) for r in o) for o in outs]
        assert owned[0] == [0, 1] and owned[1] == [2, 3]
        for o in outs:
            for r_str, hist in o.items():
                vals = [hist[str(i)] for i in range(3)]
                assert all(np.isfinite(vals)), (r_str, vals)
                assert all(abs(v) < 10.0 for v in vals), (r_str, vals)


class TestTwoDMeshTraining:
    """--num_mp_devices: the 2-D dp x mp XE path (VERDICT r2 item 5 — wire
    the 2-D mesh at real dims and make it CLI-reachable)."""

    def test_2d_train_matches_unsharded(self, tmp_path):
        import jax

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.parallel.mesh import make_mesh_2d
        from recurrent_fusion_network_tpu.training.train_loop import train

        opt, loader = synthetic_setup(batch_size=8, seq_per_img=2)
        opt.checkpoint_path = str(tmp_path / "a")
        opt.losses_log_every = 1
        opt.save_checkpoint_every = 10**9
        infos = train(opt, loader, max_iterations=3, mesh=make_mesh_2d(4, 2),
                      log_fn=lambda *a, **k: None)

        opt2, loader2 = synthetic_setup(batch_size=8, seq_per_img=2)
        opt2.checkpoint_path = str(tmp_path / "b")
        opt2.losses_log_every = 1
        opt2.save_checkpoint_every = 10**9
        ref = train(opt2, loader2, max_iterations=3,
                    log_fn=lambda *a, **k: None)
        np.testing.assert_allclose(
            list(infos["loss_history"].values()),
            list(ref["loss_history"].values()), rtol=2e-3,
        )

    def test_2d_shards_flagship_vocab_projections(self, tmp_path):
        """At the REAL vocab width (9487+1) the logit/embed projections — the
        model's largest matmuls — shard over 'mp' and their adam moments
        co-locate with the weight shards; one full train step executes."""
        import jax

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.models import setup
        from recurrent_fusion_network_tpu.parallel.mesh import (
            make_mesh_2d,
            shard_opt_state_2d,
            shard_params_2d,
        )
        from recurrent_fusion_network_tpu.training.criterion import (
            make_criterion,
        )
        from recurrent_fusion_network_tpu.training.optim import make_optimizer
        from recurrent_fusion_network_tpu.training.train_loop import (
            _device_batch,
            make_train_step,
        )

        opt, loader = synthetic_setup(batch_size=8, seq_per_img=2)
        # real vocab; tiny rnn keeps the CPU-mesh test light — the sharded
        # dims under test are the vocab-width ones
        opt.vocab_size, opt.seq_length = 9487, loader.seq_length
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        assert params["logit"]["w"].shape[1] == 9488
        mesh = make_mesh_2d(4, 2)
        tx = make_optimizer(opt)
        opt_state = tx.init(params)
        sharded = shard_params_2d(mesh, params)
        opt_state = shard_opt_state_2d(mesh, opt_state, params, sharded)

        from jax.sharding import PartitionSpec as P

        assert sharded["logit"]["w"].sharding.spec == P(None, "mp")
        assert sharded["embed"].sharding.spec == P("mp", None)
        # every device holds a 9488/2 slice of the logit, not the whole
        assert (sharded["logit"]["w"].addressable_shards[0].data.shape[1]
                == 9488 // 2)
        # moments mirror the weight shardings (no per-step all-gather)
        mu = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x, opt_state),
        )
        flat_mu = [x for x in mu if hasattr(x, "sharding")
                   and getattr(x, "shape", None) == (opt.rnn_size, 9488)]
        assert flat_mu and all(x.sharding.spec == P(None, "mp")
                               for x in flat_mu)

        crit = make_criterion(opt)
        step = make_train_step(model, crit, tx, mesh)
        data = loader.get_batch("train")
        fc, att, labels, masks, top_words = _device_batch(data, mesh)
        rng = jax.random.PRNGKey(1)
        import jax.numpy as jnp

        p2, o2, loss = step(sharded, opt_state, fc, att, labels, masks,
                            top_words, jnp.float32(5e-4), jnp.float32(0.0),
                            rng)
        assert np.isfinite(float(loss))
        # the step preserves the 2-D placement (no silent re-replication)
        assert p2["logit"]["w"].sharding.spec == P(None, "mp")
