"""Preemption-safe training (training/preempt.py): SIGTERM -> checkpoint at
the next iteration boundary -> clean exit -> exact resume (XE via
--start_from, SCST via --rl_resume; the reference's recovery model is manual
restart from the last periodic eval checkpoint, losing up to
save_checkpoint_every iterations and the whole RL run)."""

import os
import pickle
import signal
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from recurrent_fusion_network_tpu.data.prepro_ngrams import compute_doc_freq
from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
from recurrent_fusion_network_tpu.rewards.cider_d import CiderD
from recurrent_fusion_network_tpu.training import preempt
from recurrent_fusion_network_tpu.training.train_loop import train
from recurrent_fusion_network_tpu.training.train_rl_loop import train_rl


def quiet(*a, **k):
    pass


def scorer_for(loader):
    ds = loader.dataset
    train_ids = loader.split_image_id["train"]
    df = compute_doc_freq(ds, train_ids)
    return CiderD(df, float(np.log(len(train_ids))))


@pytest.mark.quick
class TestPreemptGuard:
    def test_sigterm_sets_flag_and_close_restores(self):
        old = signal.getsignal(signal.SIGTERM)
        g = preempt.PreemptGuard().install()
        try:
            assert g._installed
            os.kill(os.getpid(), signal.SIGTERM)
            deadline = time.time() + 5
            while not g.triggered and time.time() < deadline:
                time.sleep(0.01)
            assert g.triggered
        finally:
            g.close()
        assert signal.getsignal(signal.SIGTERM) is old

    def test_second_signal_steps_aside(self):
        g = preempt.PreemptGuard().install()
        try:
            g._handler(signal.SIGTERM, None)
            assert g.triggered and g._installed
            # an impatient supervisor's second SIGTERM restores the original
            # dispositions so the next one acts immediately
            g._handler(signal.SIGTERM, None)
            assert not g._installed
        finally:
            g.close()

    def test_disabled_and_non_main_thread_do_not_install(self):
        assert not preempt.PreemptGuard(enabled=False).install()._installed
        out = {}
        t = threading.Thread(
            target=lambda: out.update(g=preempt.PreemptGuard().install())
        )
        t.start()
        t.join()
        assert not out["g"]._installed


class _TriggerAfter:
    """Guard double: `triggered` flips True after n boundary checks.

    The loops poll through sync() (the multi-host-coordinated check); the
    epilogues read .triggered without advancing the count."""

    def __init__(self, n):
        self.n = n
        self.reads = 0
        self.fired = False

    def sync(self):
        self.reads += 1
        self.fired = self.reads > self.n
        return self.fired

    @property
    def triggered(self):
        return self.fired

    def close(self):
        pass


def _patch_trigger(monkeypatch, n):
    monkeypatch.setattr(
        preempt.PreemptGuard,
        "from_opt",
        classmethod(lambda cls, opt: _TriggerAfter(n)),
    )


class TestPreemptSaveResume:
    def test_xe_preempt_saves_and_resume_is_exact(self, tmp_path, monkeypatch):
        """Preempt after step 3, resume: the resumed trajectory must equal
        the uninterrupted run LABEL-FOR-LABEL — params from the boundary
        save, loader iterators from the saved state, and the dropout RNG
        CHAIN continued via the checkpointed rng_key. The snapshot records
        iteration+1 (the next step to run — the reference's post-increment
        convention, train.py), so a resume replays nothing and labels stay
        aligned with the uninterrupted run."""
        common = dict(caption_model="show_tell", batch_size=4, seed=5)

        # uninterrupted run: 6 iterations
        opt_u, loader_u = synthetic_setup(**common)
        opt_u.checkpoint_path = str(tmp_path / "u")
        opt_u.losses_log_every = 1
        opt_u.drop_prob_lm = 0.5  # make the RNG chain load-bearing
        os.makedirs(opt_u.checkpoint_path, exist_ok=True)
        infos_u = train(opt_u, loader_u, max_iterations=6, log_fn=quiet)

        # preempted run: guard fires at the boundary after step 3
        _patch_trigger(monkeypatch, 3)
        opt1, loader1 = synthetic_setup(**common)
        opt1.checkpoint_path = str(tmp_path)
        opt1.id = "pre"
        opt1.losses_log_every = 1
        opt1.drop_prob_lm = 0.5
        opt1.save_checkpoint_every = 1000  # no periodic saves — preempt only
        infos1 = train(opt1, loader1, max_iterations=50, log_fn=quiet)
        assert infos1["iter"] == 4  # steps 0..3 done
        assert os.path.exists(tmp_path / "model_pre_0.pkl")
        with open(tmp_path / "infos_pre_0.pkl", "rb") as f:
            saved = pickle.load(f)
        assert saved["iter"] == 4 and "rng_key" in saved
        assert "loader_rng" in saved  # draw-exact loader resume state
        # completed steps match the uninterrupted run
        for k in range(4):
            np.testing.assert_allclose(
                infos1["loss_history"][k], infos_u["loss_history"][k], rtol=1e-6
            )

        # resume: continues at iter 4 and reproduces uninterrupted 4..5
        _patch_trigger(monkeypatch, 10**9)
        opt2, loader2 = synthetic_setup(**common)
        opt2.checkpoint_path = str(tmp_path)
        opt2.start_from = str(tmp_path)
        opt2.load_model_id = "pre"
        opt2.losses_log_every = 1
        opt2.drop_prob_lm = 0.5
        opt2.save_checkpoint_every = 1000
        infos2 = train(opt2, loader2, max_iterations=6, log_fn=quiet)
        # saved history carried over (0..3), iters 4..5 appended — every
        # label equals the uninterrupted run's (no replay, no shift)
        assert sorted(infos2["loss_history"]) == [0, 1, 2, 3, 4, 5]
        assert infos2["iter"] == 6
        for k in range(6):
            np.testing.assert_allclose(
                infos2["loss_history"][k], infos_u["loss_history"][k], rtol=1e-6
            )

    def test_rl_preempt_and_rl_resume(self, tmp_path, monkeypatch):
        """An SCST run preempted mid-stream resumes from its own rl_
        checkpoints with --rl_resume (optimizer moments + derived LR base
        restored) — the reference can only warm-start from the XE best,
        losing all RL progress."""
        common = dict(caption_model="show_tell", batch_size=4, seed=9)

        # XE warm-start checkpoint
        opt0, loader0 = synthetic_setup(**common)
        opt0.checkpoint_path = str(tmp_path)
        opt0.id = "r0"
        opt0.save_checkpoint_every = 2
        opt0.val_images_use = 8
        train(opt0, loader0, max_iterations=3, log_fn=quiet)

        # RL run, preempted after a couple of boundary checks
        _patch_trigger(monkeypatch, 2)
        opt1, loader1 = synthetic_setup(**common)
        opt1.checkpoint_path = str(tmp_path)
        opt1.id = "r0"
        opt1.start_from = str(tmp_path)
        opt1.load_model_id = "r0"
        opt1.losses_log_every = 1
        opt1.save_checkpoint_every = 1000
        opt1.load_lr = 1  # derive the RL LR base from the XE lr history
        infos1 = train_rl(
            opt1, loader1, scorer_for(loader1), max_iterations=50, log_fn=quiet
        )
        stop = infos1["iter"]
        assert stop < 50
        assert os.path.exists(tmp_path / "rl_model_r0_0.pkl")
        with open(tmp_path / "rl_infos_r0_0.pkl", "rb") as f:
            saved = pickle.load(f)
        assert saved["iter"] == stop and "rl_lr_base" in saved

        # resume THIS RL run (not the XE warm start)
        _patch_trigger(monkeypatch, 10**9)
        opt2, loader2 = synthetic_setup(**common)
        opt2.checkpoint_path = str(tmp_path)
        opt2.id = "r0"
        opt2.start_from = str(tmp_path)
        opt2.load_model_id = "r0"
        opt2.rl_resume = 1
        opt2.losses_log_every = 1
        opt2.save_checkpoint_every = 1000
        opt2.load_lr = 0  # the saved rl_lr_base must carry the derived base
        infos2 = train_rl(
            opt2, loader2, scorer_for(loader2), max_iterations=stop + 2,
            log_fn=quiet,
        )
        new_iters = [k for k in infos2["lr_history"] if k >= stop]
        assert min(new_iters) == stop and infos2["iter"] == stop + 2
        # LR base survived the resume (load_lr=0 would otherwise reset it)
        assert infos2["lr_history"][stop] == pytest.approx(
            saved["lr_history"][stop - 1]
        )


class TestFleetPreempt:
    def test_fleet_preempt_saves_rolling_and_seed_resumes_solo(
        self, tmp_path, monkeypatch
    ):
        """A preempted multi-seed fleet saves rolling per-seed checkpoints
        BEFORE any eval (a full fleet eval would outlive the preemption
        grace window at flagship dims), and each seed resumes with the
        SOLO loop — the files use train()'s model_{id}_{rank} naming."""
        from recurrent_fusion_network_tpu.training.checkpoint import (
            load_checkpoint,
        )
        from recurrent_fusion_network_tpu.training.multi_seed import (
            train_multi_seed,
        )

        _patch_trigger(monkeypatch, 3)
        opt, loader = synthetic_setup(caption_model="show_tell", batch_size=4)
        opt.checkpoint_path = str(tmp_path)
        opt.val_images_use = 8
        opt.id = "fp"
        res = train_multi_seed(
            opt, loader, 2, max_iterations=50, eval_at_end=False, log_fn=quiet
        )
        # no eval ran (preempt skips it), but every seed has a rolling save
        assert all(s is None for s in res["cider_per_seed"])
        for r in range(2):
            params, opt_state, infos = load_checkpoint(
                str(tmp_path), "fp", r, best=False
            )
            assert "embed" in params and opt_state is not None
            assert infos["iter"] == 3 and "iterators" in infos

        # a preempted fleet seed continues under the solo XE loop
        _patch_trigger(monkeypatch, 10**9)
        opt2, loader2 = synthetic_setup(caption_model="show_tell", batch_size=4)
        opt2.checkpoint_path = str(tmp_path)
        opt2.id = "fp"
        opt2.start_from = str(tmp_path)
        opt2.load_model_id = "fp"
        opt2.losses_log_every = 1
        opt2.save_checkpoint_every = 1000
        infos2 = train(opt2, loader2, rank=1, max_iterations=5, log_fn=quiet)
        assert infos2["iter"] == 5
        assert {3, 4}.issubset(infos2["loss_history"])


class TestFleetResume:
    def test_xe_fleet_resumes_as_fleet_exactly(self, tmp_path, monkeypatch):
        """A preempted XE fleet resumes AS A FLEET (--start_from) and the
        merged trajectories equal an uninterrupted run step-for-step: the
        rolling saves carry params, moments, per-seed RNG chains (dropout
        is on to make them load-bearing), and the loader cursor."""
        from recurrent_fusion_network_tpu.training.multi_seed import (
            train_multi_seed,
        )

        common = dict(caption_model="show_tell", batch_size=4, seed=11)

        _patch_trigger(monkeypatch, 10**9)
        opt_u, loader_u = synthetic_setup(**common)
        opt_u.losses_log_every = 1
        opt_u.drop_prob_lm = 0.5
        full = train_multi_seed(opt_u, loader_u, 2, max_iterations=6,
                                eval_at_end=False, save=False, log_fn=quiet)

        _patch_trigger(monkeypatch, 3)
        opt1, loader1 = synthetic_setup(**common)
        opt1.checkpoint_path = str(tmp_path)
        opt1.id = "fr"
        opt1.losses_log_every = 1
        opt1.drop_prob_lm = 0.5
        opt1.save_checkpoint_every = 1000
        train_multi_seed(opt1, loader1, 2, max_iterations=50,
                         eval_at_end=False, log_fn=quiet)

        _patch_trigger(monkeypatch, 10**9)
        opt2, loader2 = synthetic_setup(**common)
        opt2.checkpoint_path = str(tmp_path)
        opt2.id = "fr"
        opt2.start_from = str(tmp_path)
        opt2.load_model_id = "fr"
        opt2.losses_log_every = 1
        opt2.drop_prob_lm = 0.5
        opt2.save_checkpoint_every = 1000
        res = train_multi_seed(opt2, loader2, 2, max_iterations=6,
                               eval_at_end=False, save=False, log_fn=quiet)

        # histories merge seamlessly: saved 0..2 carried over, 3..5 appended,
        # every value matching the uninterrupted fleet
        for r in range(2):
            assert sorted(res["loss_histories"][r]) == [0, 1, 2, 3, 4, 5]
            np.testing.assert_allclose(
                [res["loss_histories"][r][k] for k in range(6)],
                [full["loss_histories"][r][k] for k in range(6)],
                rtol=1e-6,
            )
        import jax

        for a, b in zip(jax.tree_util.tree_leaves(res["params"]),
                        jax.tree_util.tree_leaves(full["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_xe_fleet_resume_composes_with_orbax_backend(
        self, tmp_path, monkeypatch
    ):
        """The fleet rolling-save/resume path goes through the configured
        checkpoint backend: a fleet preempted under --checkpoint_backend
        orbax resumes from the orbax per-seed directories (np rng_key in
        the sidecar infos pickle included)."""
        from recurrent_fusion_network_tpu.training.multi_seed import (
            train_multi_seed,
        )

        common = dict(caption_model="show_tell", batch_size=4, seed=17)

        _patch_trigger(monkeypatch, 2)
        opt1, loader1 = synthetic_setup(**common)
        opt1.checkpoint_path = str(tmp_path)
        opt1.checkpoint_backend = "orbax"
        opt1.id = "fo"
        opt1.losses_log_every = 1
        opt1.save_checkpoint_every = 1000
        train_multi_seed(opt1, loader1, 2, max_iterations=50,
                         eval_at_end=False, log_fn=quiet)
        assert os.path.isdir(tmp_path / "model_fo_1.orbax")

        _patch_trigger(monkeypatch, 10**9)
        opt2, loader2 = synthetic_setup(**common)
        opt2.checkpoint_path = str(tmp_path)
        opt2.checkpoint_backend = "orbax"
        opt2.id = "fo"
        opt2.start_from = str(tmp_path)
        opt2.load_model_id = "fo"
        opt2.losses_log_every = 1
        opt2.save_checkpoint_every = 1000
        res = train_multi_seed(opt2, loader2, 2, max_iterations=4,
                               eval_at_end=False, save=False, log_fn=quiet)
        for r in range(2):
            assert sorted(res["loss_histories"][r]) == [0, 1, 2, 3]

    def test_fleet_preempt_with_async_orbax_completes_writes(
        self, tmp_path, monkeypatch
    ):
        """A preempted fleet under --checkpoint_async must not exit with
        in-flight TensorStore writes: the trainer's wait_until_finished
        barrier runs before return, so the rolling per-seed orbax dirs are
        complete and immediately resumable."""
        from recurrent_fusion_network_tpu.training.checkpoint import backend
        from recurrent_fusion_network_tpu.training.multi_seed import (
            train_multi_seed,
        )

        common = dict(caption_model="show_tell", batch_size=4, seed=23)
        _patch_trigger(monkeypatch, 2)
        opt1, loader1 = synthetic_setup(**common)
        opt1.checkpoint_path = str(tmp_path)
        opt1.checkpoint_backend = "orbax"
        opt1.checkpoint_async = 1
        opt1.id = "fa"
        opt1.losses_log_every = 1
        opt1.save_checkpoint_every = 1000
        train_multi_seed(opt1, loader1, 2, max_iterations=50,
                         eval_at_end=False, log_fn=quiet)
        # the writes landed (no pending-commit markers) and load cleanly
        ck = backend(opt1)
        for r in range(2):
            params, opt_state, infos = ck.load_checkpoint(
                str(tmp_path), "fa", r, best=False
            )
            assert "embed" in params and opt_state is not None
            assert infos["iter"] == 2 and "rng_key" in infos

        _patch_trigger(monkeypatch, 10**9)
        opt2, loader2 = synthetic_setup(**common)
        opt2.checkpoint_path = str(tmp_path)
        opt2.checkpoint_backend = "orbax"
        opt2.checkpoint_async = 1
        opt2.id = "fa"
        opt2.start_from = str(tmp_path)
        opt2.load_model_id = "fa"
        opt2.losses_log_every = 1
        opt2.save_checkpoint_every = 1000
        res = train_multi_seed(opt2, loader2, 2, max_iterations=4,
                               eval_at_end=False, save=False, log_fn=quiet)
        for r in range(2):
            assert sorted(res["loss_histories"][r]) == [0, 1, 2, 3]

    def test_rl_fleet_resumes_as_fleet_exactly(self, tmp_path, monkeypatch):
        """A preempted SCST fleet resumes AS A FLEET (--rl_resume
        --start_from): rollout RNG chains, moments, and per-seed LR bases
        restore, so the merged reward trajectories equal an uninterrupted
        fleet's."""
        from recurrent_fusion_network_tpu.training.multi_seed import (
            train_multi_seed_rl,
        )

        common = dict(caption_model="show_tell", batch_size=4, seed=13,
                      seq_per_img=2)

        _patch_trigger(monkeypatch, 10**9)
        opt_u, loader_u = synthetic_setup(**common)
        opt_u.losses_log_every = 1
        full = train_multi_seed_rl(opt_u, loader_u, scorer_for(loader_u), 2,
                                   max_iterations=5, eval_at_end=False,
                                   save=False, log_fn=quiet)

        _patch_trigger(monkeypatch, 2)
        opt1, loader1 = synthetic_setup(**common)
        opt1.checkpoint_path = str(tmp_path)
        opt1.id = "frl"
        opt1.losses_log_every = 1
        opt1.save_checkpoint_every = 1000
        train_multi_seed_rl(opt1, loader1, scorer_for(loader1), 2,
                            max_iterations=50, eval_at_end=False,
                            log_fn=quiet)
        assert os.path.exists(tmp_path / "rl_model_frl_0.pkl")

        _patch_trigger(monkeypatch, 10**9)
        opt2, loader2 = synthetic_setup(**common)
        opt2.checkpoint_path = str(tmp_path)
        opt2.id = "frl"
        opt2.start_from = str(tmp_path)
        opt2.load_model_id = "frl"
        opt2.rl_resume = 1
        opt2.losses_log_every = 1
        opt2.save_checkpoint_every = 1000
        res = train_multi_seed_rl(opt2, loader2, scorer_for(loader2), 2,
                                  max_iterations=5, eval_at_end=False,
                                  save=False, log_fn=quiet)

        for r in range(2):
            assert sorted(res["reward_histories"][r]) == [0, 1, 2, 3, 4]
            np.testing.assert_allclose(
                [res["reward_histories"][r][k] for k in range(5)],
                [full["reward_histories"][r][k] for k in range(5)],
                rtol=1e-6,
            )
        import jax

        for a, b in zip(jax.tree_util.tree_leaves(res["params"]),
                        jax.tree_util.tree_leaves(full["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestSigtermEndToEnd:
    def test_main_py_sigterm_checkpoints_and_exits_zero(self, tmp_path):
        """Real-surface drill: main.py under SIGTERM writes the triple-file
        checkpoint and exits 0 inside the grace window."""
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # strip the axon trigger: a CPU-pinned child must not touch the
        # TPU tunnel at all — with the pool unreachable, the plugin's
        # connection retries hang the drill (observed live)
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS")}
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        env["PYTHONUNBUFFERED"] = "1"
        cmd = [
            sys.executable, os.path.join(repo_root, "main.py"),
            "--caption_model", "show_tell", "--feature_type", "synthetic",
            "--batch_size", "4", "--rnn_size", "32",
            "--input_encoding_size", "32", "--max_iterations", "100000",
            "--losses_log_every", "1", "--save_checkpoint_every", "100000",
            "--checkpoint_path", str(tmp_path), "--id", "sig",
        ]
        p = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True, env=env)
        try:
            deadline = time.time() + 180
            for line in p.stdout:
                if "iter 2" in line or time.time() > deadline:
                    break
            p.send_signal(signal.SIGTERM)
            out = p.stdout.read()
            assert p.wait(timeout=180) == 0, out[-3000:]
        finally:
            if p.poll() is None:
                p.kill()
        assert "preempted" in out, out[-3000:]
        assert os.path.exists(tmp_path / "model_sig_0.pkl")
        with open(tmp_path / "infos_sig_0.pkl", "rb") as f:
            infos = pickle.load(f)
        # the saved iter matches what the preemption message reported (under
        # CI load SIGTERM can land before iter 2 despite the stdout wait, so
        # don't hardcode the count — assert save/report coherence instead)
        import re

        m = re.search(r"preempted — checkpoint saved \(resumes at iter (\d+)\)", out)
        assert m, out[-3000:]
        assert infos["iter"] == int(m.group(1)) and "rng_key" in infos
