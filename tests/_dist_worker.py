"""Worker for the multi-host XE training test (launched by
tests/test_distributed.py): joins a 2-process CPU cluster, trains a few
DP-sharded steps over the GLOBAL mesh with a host-sharded loader, and prints
its loss trajectory as JSON."""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "xe"
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=n, process_id=pid
    )
    from recurrent_fusion_network_tpu.data.loader import DataLoader
    from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
    from recurrent_fusion_network_tpu.parallel.distributed import (
        global_dp_mesh,
        host_shard,
    )
    from recurrent_fusion_network_tpu.training.train_loop import train

    assert host_shard() == (pid, n)
    assert len(jax.devices()) == 2 * n and len(jax.local_devices()) == 2

    opt, base = synthetic_setup(caption_model="show_tell", batch_size=8,
                                seq_per_img=2)
    opt.checkpoint_path = "/tmp/dist_test_ckpt"
    opt.losses_log_every = 1
    loader = DataLoader(opt, base.dataset, base.sources, prefetch=False,
                        host_shard=host_shard())
    mesh = global_dp_mesh()
    if mode == "preempt":
        # Coordinated multi-host preemption: SIGTERM (simulated — the flag
        # flips on HOST 1 ONLY, after 2 boundary checks) must stop BOTH
        # hosts at the same iteration boundary via guard.sync()'s allgather;
        # a host breaking alone would deadlock the other inside the next
        # collective step, and this subprocess would hit the test timeout.
        from recurrent_fusion_network_tpu.training import preempt

        class OneHostTrigger(preempt.PreemptGuard):
            def __init__(self):
                super().__init__(enabled=True)
                self.calls = 0

            def install(self):
                return self  # no real signal handlers in the test

            def sync(self):
                self.calls += 1
                if pid == 1 and self.calls > 2:
                    self.triggered = True
                return super().sync()

        preempt.PreemptGuard.from_opt = classmethod(
            lambda cls, o: OneHostTrigger()
        )
        opt.id = "mhp"
        # per-host dir so the test can OBSERVE the write discipline: on a
        # shared FS every process would hit the same path, so the solo
        # loops gate pickle writes to process 0 — host 1 must save nothing
        opt.checkpoint_path = os.path.join(sys.argv[5], f"h{pid}")
        os.makedirs(opt.checkpoint_path, exist_ok=True)
        opt.save_checkpoint_every = 10**9
        infos = train(opt, loader, max_iterations=50, mesh=mesh,
                      log_fn=lambda *a, **k: None)
        print("LOSSES:" + json.dumps({"iter": infos["iter"]}), flush=True)
        return
    if mode == "eval":
        # per-host eval over the host-sharded loader: process_count()>1 makes
        # eval_split fall back to per-host local eval, which must dedupe with
        # the LOCAL image count (regression: it used the global batch size)
        from recurrent_fusion_network_tpu.models import setup
        from recurrent_fusion_network_tpu.training.eval_split import eval_split

        opt.vocab_size, opt.seq_length = loader.vocab_size, loader.seq_length
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        _, preds, _ = eval_split(
            model, params, loader, opt, split="val", val_images_use=16,
            beam_size=2, language_eval_flag=False, mesh=mesh,
        )
        print("PREDS:" + json.dumps(preds), flush=True)
        return
    if mode == "evalagree":
        # Periodic eval on multi-host: each host scores only ITS slice of
        # the host-sharded val stream, so the raw local scores DIVERGE; the
        # loop must gate best_flag/num_period_best on the host_mean'd score
        # (identical on every host) and write pickle files from process 0
        # only. The worker prints its verdict state for cross-host compare.
        opt.id = "mha"
        opt.checkpoint_path = os.path.join(sys.argv[5], f"h{pid}")
        os.makedirs(opt.checkpoint_path, exist_ok=True)
        opt.save_checkpoint_every = 2
        opt.val_images_use = 8
        opt.language_eval = 0  # score = -val_loss (host-local without fix)
        infos = train(opt, loader, max_iterations=5, mesh=mesh,
                      log_fn=lambda *a, **k: None)
        local_scores = {
            str(k): float(v["loss"]) for k, v in
            infos.get("val_result_history", {}).items()
        }
        print("LOSSES:" + json.dumps({
            "iter": infos["iter"],
            "best": infos.get("best_val_score"),
            "npb": infos.get("num_period_best"),
            "local_losses": local_scores,
        }), flush=True)
        return
    if mode == "rl":
        import numpy as np

        from recurrent_fusion_network_tpu.data.prepro_ngrams import (
            compute_doc_freq,
        )
        from recurrent_fusion_network_tpu.rewards.cider_d import CiderD
        from recurrent_fusion_network_tpu.training.train_rl_loop import train_rl

        ids = loader.split_image_id["train"]
        scorer = CiderD(compute_doc_freq(loader.dataset, ids),
                        float(np.log(len(ids))))
        infos = train_rl(opt, loader, scorer, max_iterations=3, mesh=mesh,
                         log_fn=lambda *a, **k: None)
    elif mode in ("fleet", "fleetrl"):
        # multi-host fleet-over-mesh: 4 seeds over the global 4-device mesh
        # (2 per host); fleet loaders read the FULL stream (seeds share the
        # batch), so use an UNSHARDED loader — only the seed axis is sharded
        import numpy as np

        from recurrent_fusion_network_tpu.training.multi_seed import (
            train_multi_seed,
            train_multi_seed_rl,
        )

        full_loader = DataLoader(opt, base.dataset, base.sources,
                                 prefetch=False)
        opt.save_checkpoint_every = 10**9  # no mid-run eval in 3 iters
        if mode == "fleet":
            out = train_multi_seed(
                opt, full_loader, 4, max_iterations=3, eval_at_end=False,
                save=False, mesh=mesh, log_fn=lambda *a, **k: None,
            )
            payload = {str(r): out["loss_histories"][r]
                       for r in out["local_seeds"]}
        else:
            from recurrent_fusion_network_tpu.data.prepro_ngrams import (
                compute_doc_freq,
            )
            from recurrent_fusion_network_tpu.rewards.cider_d import CiderD

            ids = full_loader.split_image_id["train"]
            scorer = CiderD(compute_doc_freq(full_loader.dataset, ids),
                            float(np.log(len(ids))))
            out = train_multi_seed_rl(
                opt, full_loader, scorer, 4, max_iterations=3,
                eval_at_end=False, save=False, mesh=mesh,
                log_fn=lambda *a, **k: None,
            )
            payload = {str(r): out["reward_histories"][r]
                       for r in out["local_seeds"]}
        print("LOSSES:" + json.dumps(payload), flush=True)
        return
    else:
        infos = train(opt, loader, max_iterations=3, mesh=mesh,
                      log_fn=lambda *a, **k: None)
    print("LOSSES:" + json.dumps(list(infos["loss_history"].values())),
          flush=True)


if __name__ == "__main__":
    main()
