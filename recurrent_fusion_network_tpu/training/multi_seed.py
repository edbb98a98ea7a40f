"""Vmapped multi-seed fleet training.

The reference produces its ensemble's N checkpoints by launching N
independent single-GPU jobs from bash, one seed per GPU
(train_recurrent_fusion_model.sh:7-30). The TPU-native equivalent trains all
N seeds IN ONE PROGRAM: parameters and optimizer states get a leading seed
axis and the jitted train step is vmapped over it — every seed's matmuls
batch together on the MXU, and one chip replaces the 8-GPU host. Seeds share
the data stream but differ in initialization, dropout, and scheduled-sampling
draws (each seed folds its own RNG).

The resulting per-seed checkpoints are directly consumable by
eval_ensemble.py (rank = seed index, matching the reference's per-rank
checkpoint naming).

Fleet-over-mesh: pass ``mesh`` (a 1-D 'dp' mesh) to shard the SEED axis
across devices — seed r's whole training state lives on device r//(S/D) and
every seed's step runs in parallel with no cross-device collectives (the
seeds are independent). This is the literal TPU analogue of the reference's
one-job-per-GPU fleet (train_recurrent_fusion_model.sh:7-30): a v5e-8 slice
trains 8 seeds at single-seed wall-clock. n_seeds must divide by the mesh
size; trajectories are identical to the unsharded vmap (tested).

Multi-host fleets: the mesh may span processes (parallel.distributed's
global_dp_mesh). Each host materializes and owns only ITS contiguous block
of seeds (`_local_seed_ids`): rollout reward scoring, validation eval, best
tracking, and checkpoint writes all run per-host over local seeds, and the
vmapped step executes as one GSPMD program over the global mesh. Every host
reads the FULL (unsharded) data stream — seeds share the batch — so fleet
loaders must NOT be host-sharded. RL warm start (--start_from) reads every
seed's XE checkpoint on every host and commits only local rows; use a
shared checkpoint filesystem (the standard pod setup) for multi-host RL.
Trajectories are identical to the single-process fleet (2-process CPU
cluster test, tests/test_distributed.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import setup
from .checkpoint import backend as checkpoint_backend
from .criterion import make_criterion, make_rl_criterion
from .eval_split import batch_feats, eval_split
from .optim import apply_updates, lr_for_epoch, make_optimizer, ss_prob_for_epoch


def _seed_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("dp"))


def _shard_seed_axis(mesh, n_seeds, *trees):
    """Commit each tree with its leading (seed) axis split over the mesh's
    'dp' axis; returns the trees in order.

    Multi-process meshes are supported: every process computes the full
    stacked host array (seed init is deterministic from opt.seed), and
    `make_array_from_callback` materializes only this process's addressable
    seed rows into the global array — the per-host half of the reference's
    multi-host fleet (train_recurrent_fusion_model.sh's 8-job loop run
    across hosts). Host-side readback of non-local seeds is never needed:
    scoring/eval/saving go through `_local_seed_ids` + `_seed_row`.
    """
    d = mesh.shape["dp"]
    assert n_seeds % d == 0, (
        f"n_seeds {n_seeds} must divide by the mesh size {d}"
    )
    sharding = _seed_sharding(mesh)
    if jax.process_count() == 1:
        out = tuple(
            jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), t)
            for t in trees
        )
        return out if len(out) > 1 else out[0]

    def commit(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    out = tuple(jax.tree_util.tree_map(commit, t) for t in trees)
    return out if len(out) > 1 else out[0]


def _local_seed_ids(mesh, n_seeds):
    """The seed rows whose shards live on THIS process's devices, sorted.
    With the process-major 1-D mesh these are one contiguous block per
    host — each host owns n_seeds/process_count fleet members."""
    sharding = _seed_sharding(mesh)
    local = set(jax.local_devices())
    ids = set()
    for dev, idx in sharding.devices_indices_map((n_seeds,)).items():
        if dev in local:
            sl = idx[0]
            start = sl.start or 0
            stop = sl.stop if sl.stop is not None else n_seeds
            ids.update(range(start, stop))
    return sorted(ids)


def _seed_row(x, r) -> np.ndarray:
    """Host copy of seed r's row of a (possibly multi-host seed-sharded)
    array. Only valid for r in _local_seed_ids on multi-process meshes."""
    shards = getattr(x, "addressable_shards", None)
    if shards is None or x.is_fully_addressable:
        return np.asarray(x[r])
    for s in shards:
        sl = s.index[0]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else x.shape[0]
        if start <= r < stop:
            return np.asarray(s.data[r - start])
    raise IndexError(
        f"seed {r} is not addressable on process {jax.process_index()} "
        f"(local seeds: use _local_seed_ids)"
    )


def _stack_seed_trees(per_seed):
    """Stack per-seed checkpoint pytrees along a new leading axis ON HOST.

    jnp.stack would device-put every seed's params/moments onto the default
    device first — at flagship scale (8 seeds x ~5.3 GB params+moments) a
    >40 GB transient on one 16 GB chip. Host np arrays instead flow to
    devices only through _shard_seed_axis (sharded placement) or the first
    vstep dispatch (single device), so no full-fleet transient ever lands
    on one chip."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *per_seed
    )


def _assert_arch_matches(opt, saved_opt):
    from .checkpoint import assert_arch_matches

    assert_arch_matches(opt, saved_opt)


def train_multi_seed(
    opt,
    loader,
    n_seeds: int,
    *,
    max_iterations: Optional[int] = None,
    eval_at_end: bool = True,
    save: bool = True,
    mesh=None,
    log_fn=print,
):
    """Train n_seeds models simultaneously. Returns a dict with the stacked
    params, per-seed loss histories, and (optionally) per-seed final CIDEr.
    mesh: optional 1-D 'dp' mesh sharding the seed axis across devices
    (fleet-over-mesh; see module docstring).

    Resume: with opt.start_from set, the whole fleet continues bitwise-
    exactly from its rolling per-seed checkpoints (written every
    save_checkpoint_every iterations and on SIGTERM preemption) — params,
    optimizer moments, per-seed RNG chains, loader cursor, and histories
    all restore. The files use solo train()'s model_{id}_{rank} naming, so
    a preempted fleet can also be finished as n_seeds solo runs (rank=r)
    and vice versa."""
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length
    model = setup(opt)
    _ckpt = checkpoint_backend(opt)
    # fleet checkpoints are HOST-LOCAL: each host saves only its own seeds'
    # files (per-rank paths), independently and possibly a different number
    # of times per boundary (improvement-gated -best saves). Orbax saves
    # are collective — every process must join a barrier per save — so the
    # two are structurally incompatible past one process.
    if jax.process_count() > 1 and getattr(_ckpt, "collective", False):
        raise ValueError(
            "multi-host fleets need --checkpoint_backend pickle: per-seed "
            "checkpoint files are host-local, but orbax saves run a "
            "cross-process barrier per save (counts/paths diverge)"
        )
    crit = make_criterion(opt)
    tx = make_optimizer(opt)

    # per-seed base key -> (run, init) split, same discipline as the RL
    # fleet: the init key and the run chain never share threefry streams.
    # (PRNGKey(seed + r) -> split[0] is exactly solo train()'s rank-r chain,
    # so fleet checkpoints and solo checkpoints are RNG-interchangeable.)
    base_keys = jnp.stack(
        [jax.random.PRNGKey(opt.seed + r) for r in range(n_seeds)]
    )
    split_keys = jax.vmap(jax.random.split)(base_keys)  # (S, 2, key)
    rngs, init_rngs = split_keys[:, 0], split_keys[:, 1]

    resume_infos = None
    if opt.start_from is not None:
        # Fleet resume: continue the whole fleet from its rolling per-seed
        # checkpoints (periodic or preemption saves — solo model_{id}_{r}
        # naming, so a fleet can also resume a set of solo runs and vice
        # versa). Trajectories continue bitwise-exactly: params, moments,
        # per-seed RNG chains, loader cursor, and histories all restore.
        # HBM discipline as in the RL warm start: never materialize a
        # throwaway random-init fleet that a restore immediately replaces.
        per_p, per_s = [], []
        resume_infos = []
        for r in range(n_seeds):
            p, s, i = _ckpt.load_checkpoint(
                opt.start_from, opt.load_model_id, r, best=False
            )
            per_p.append(p)
            per_s.append(s)
            resume_infos.append(i)
        _assert_arch_matches(opt, resume_infos[0].get("opt", {}))
        params = _stack_seed_trees(per_p)
        del per_p
        if all(s is not None for s in per_s):
            from .checkpoint import adopt_structure

            template = jax.eval_shape(
                tx.init,
                jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape[1:], x.dtype),
                    params,
                ),
            )
            opt_state = _stack_seed_trees(
                [adopt_structure(template, s) for s in per_s]
            )
        else:
            opt_state = jax.vmap(tx.init)(params)
        del per_s
        if all("rng_key" in i for i in resume_infos):
            rngs = jnp.stack(
                [jnp.asarray(i["rng_key"]) for i in resume_infos]
            )
        if "iterators" in resume_infos[0]:
            loader.restore_state(
                resume_infos[0]["iterators"],
                resume_infos[0]["split_image_id"],
                resume_infos[0].get("loader_rng"),
            )
    else:
        params = jax.vmap(model.init_params)(init_rngs)
        opt_state = jax.vmap(tx.init)(params)
    if mesh is not None:
        params, opt_state = _shard_seed_axis(mesh, n_seeds, params, opt_state)

    def one_step(params, opt_state, rng, fc, att, labels, masks, top_words, lr, ss):
        def loss_fn(p):
            lps, reason = model.forward(
                p, fc, att, labels, ss_prob=ss, rng=rng, deterministic=False
            )
            return crit(lps, labels, masks, reason, top_words)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        direction, opt_state = tx.update(grads, opt_state, params)
        params = apply_updates(params, direction, lr)
        return params, opt_state, loss

    # vmap over the seed axis: params/state/rng per-seed, batch shared
    vstep = jax.jit(
        jax.vmap(
            one_step,
            in_axes=(0, 0, 0, None, None, None, None, None, None, None),
        ),
        donate_argnums=(0, 1),  # in-place param/opt-state update
    )

    if mesh is not None:
        rngs = _shard_seed_axis(mesh, n_seeds, rngs)
    # per-host seed ownership: on a multi-process mesh each host evaluates,
    # tracks, and checkpoints ONLY its local block of seeds (disjoint across
    # hosts; together they cover the fleet)
    local_seeds = (
        _local_seed_ids(mesh, n_seeds)
        if mesh is not None and jax.process_count() > 1
        else list(range(n_seeds))
    )
    iteration, epoch = 0, 0
    loss_histories = [dict() for _ in range(n_seeds)]
    lr_history = {}  # shared schedule; checkpointed per seed so the RL
    # phase's --load_lr derivation works from fleet checkpoints too
    # per-seed best-by-validation tracking: the '-best' checkpoints must hold
    # the best-scoring params (train.py:200-236 contract per seed), not the
    # final-iteration ones — a fleet that degrades late must not ship
    # degraded ensemble members
    best_scores = [None] * n_seeds
    best_params = [None] * n_seeds
    best_opt_states = [None] * n_seeds  # checkpointed so the RL phase can
    # restore optimizer moments under --load_lr (train_rl.py:96-98 contract)
    val_histories = [dict() for _ in range(n_seeds)]
    if resume_infos is not None:
        iteration = resume_infos[0].get("iter", 0)
        epoch = resume_infos[0].get("epoch", 0)
        loss_histories = [dict(i.get("loss_history", {})) for i in resume_infos]
        lr_history = dict(resume_infos[0].get("lr_history", {}))
        val_histories = [
            dict(i.get("val_result_history", {})) for i in resume_infos
        ]
        if opt.load_best_score:
            # same gate as solo: the -best files from the earlier run stay
            # authoritative until a resumed eval beats their score
            best_scores = [i.get("best_val_score", None) for i in resume_infos]
    lr = opt.optim_lr
    ss = 0.0
    update_lr_flag = True
    no_improve = [0] * n_seeds  # per-seed stagnant-eval counters (solo
    # train()'s num_period_best, per fleet member); survive resume so a
    # requeued fleet keeps its accumulated early-stop progress
    if resume_infos is not None:
        no_improve = [int(i.get("no_improve", 0)) for i in resume_infos]

    def seed_slice(r, tree=None):
        tree = params if tree is None else tree
        return jax.tree_util.tree_map(lambda x: _seed_row(x, r), tree)

    def seed_infos(r):
        return {
            "iter": iteration,
            "epoch": epoch,
            "iterators": dict(loader.iterators),
            "split_image_id": {s: list(v) for s, v in loader.split_image_id.items()},
            "loader_rng": dict(loader.rng_states),  # draw-exact resume
            "opt": dict(vars(opt)),
            "loss_history": loss_histories[r],
            "lr_history": dict(lr_history),
            "val_result_history": val_histories[r],
            "best_val_score": best_scores[r],
            "no_improve": no_improve[r],  # early-stop progress
            "rng_key": _seed_row(rngs, r),  # resume continues the chain
            "vocab": loader.get_vocab(),
        }

    def fleet_stagnant():
        """Early-stop gate: every seed stagnant for num_eval_no_improve
        evals (the reference's per-job 'no improvement, exit', train.py:238,
        across the whole fleet — the vmapped seeds step together, so the
        fleet stops when its LAST member stops improving). Multi-host: the
        exit is collective, so hosts all-gather their local verdicts (same
        discipline as PreemptGuard.sync)."""
        from ..parallel.distributed import all_hosts_agree

        return all_hosts_agree(
            all(no_improve[r] >= opt.num_eval_no_improve
                for r in local_seeds)
        )

    def eval_seeds(at_iter):
        # returns ({r: host params}, {r: host opt state}) so a rolling save
        # at the same boundary reuses the copies instead of a second full
        # device->host readback (flagship scale: 1.76 GB params + 3.5 GB
        # adam moments per seed through the tunnel). Moments are only
        # materialized for seeds that improved (the -best save needs them);
        # non-improving seeds' moments are sliced lazily by save_rolling.
        host_params, host_opts = {}, {}
        for r in local_seeds:
            p = host_params[r] = seed_slice(r)
            val_loss, _, stats = eval_split(
                model, p, loader, opt, split="val", rank=r,
                language_eval_flag=bool(opt.language_eval),
            )
            score = stats["CIDEr"] if stats else -val_loss
            val_histories[r][at_iter] = {"loss": val_loss, "lang_stats": stats}
            if best_scores[r] is None or score > best_scores[r]:
                no_improve[r] = 1
                best_scores[r] = score
                best_params[r] = p
                best_opt_states[r] = host_opts[r] = seed_slice(r, opt_state)
                if save:
                    # persist -best at improvement time (solo train()'s
                    # contract per seed) — a crash or preemption later must
                    # not lose the best-scoring snapshot, which otherwise
                    # lives only in host memory until the epilogue
                    _ckpt.save_checkpoint(
                        opt.checkpoint_path, opt.id, r,
                        params=best_params[r], opt_state=best_opt_states[r],
                        infos=seed_infos(r), best=True,
                    )
            else:
                no_improve[r] += 1
        log_fn(
            f"iter {at_iter} fleet val scores: "
            + " ".join("-" if best_scores[r] is None else
                       f"{best_scores[r]:.3f}" for r in local_seeds)
        )
        return host_params, host_opts

    def save_rolling(eval_slices=None):
        # rolling per-seed checkpoints, solo model_{id}_{rank} naming: the
        # fleet resumes as a fleet (--start_from, see resume block above) or
        # any seed resumes solo (train(), rank=r) — bitwise-exactly, since
        # the per-seed RNG chain rides in infos. eval_slices: the
        # (host_params, host_opts) pair eval_seeds materialized at this same
        # boundary — params always, adam moments for seeds that improved —
        # reused here so neither tree pays a second device->host readback.
        host_params, host_opts = eval_slices if eval_slices else ({}, {})
        for r in local_seeds:
            # pop as consumed: a non-improving seed's host params are freed
            # right after its write instead of pinning every local seed's
            # 1.76 GB copy until the whole loop finishes (improved seeds'
            # slices stay alive via best_params/best_opt_states by design)
            p = host_params.pop(r) if r in host_params else seed_slice(r)
            o = host_opts.pop(r) if r in host_opts else seed_slice(r, opt_state)
            _ckpt.save_checkpoint(
                opt.checkpoint_path, opt.id, r,
                params=p, opt_state=o,
                infos=seed_infos(r), best=False,
            )

    from .preempt import PreemptGuard

    guard = PreemptGuard.from_opt(opt)

    while True:
        if guard.sync():
            # Persist FIRST, inside the grace window: rolling per-seed
            # checkpoints are cheap device->host copies, while a full
            # eval_seeds (per-seed beam decode over the val split) takes
            # minutes at flagship dims and would be killed by the
            # supervisor's SIGKILL. Resume the whole fleet with
            # --start_from (exact), or any seed solo (train(), rank=r).
            if save:
                log_fn(
                    "preempted — saving rolling per-seed checkpoints at "
                    f"iter {iteration}"
                )
                save_rolling()
            break
        if update_lr_flag:
            lr = lr_for_epoch(opt, epoch, opt.optim_lr)
            ss = ss_prob_for_epoch(opt, epoch)
            update_lr_flag = False
        data = loader.get_batch("train")
        fc, att = batch_feats(data)
        labels = jnp.asarray(data["labels"])
        masks = jnp.asarray(data["masks"])
        top_words = jnp.asarray(data["top_words"])
        # two-way split: one side advances the chain, the OTHER feeds the
        # step (reusing the chain key as the step key would overlap the
        # threefry streams across iterations — same discipline as
        # train_loop.py's rng, step_rng = split(rng))
        sk = jax.vmap(jax.random.split)(rngs)
        rngs, step_rngs = sk[:, 0], sk[:, 1]
        params, opt_state, losses = vstep(
            params, opt_state, step_rngs, fc, att, labels, masks, top_words,
            jnp.float32(lr), jnp.float32(ss),
        )
        if data["bounds"]["wrapped"]:
            epoch += 1
            update_lr_flag = True
        if iteration % opt.losses_log_every == 0:
            local_losses = {r: float(_seed_row(losses, r))
                            for r in local_seeds}
            for r, l in local_losses.items():
                loss_histories[r][iteration] = l
            lr_history[iteration] = lr
            log_fn(
                f"iter {iteration} (epoch {epoch}) losses: "
                + " ".join(f"{l:.3f}" for l in local_losses.values())
            )
        periodic_save = (
            save and iteration % opt.save_checkpoint_every == 0
            and iteration > 0
        )
        stop_early = False
        eval_slices = None
        if iteration % opt.save_checkpoint_every == 0 and iteration > 0:
            eval_slices = eval_seeds(iteration)
            stop_early = fleet_stagnant()
        iteration += 1
        if periodic_save:
            # AFTER the increment: the snapshot's iter is the next step to
            # run, so a resumed fleet replays nothing (the preemption save
            # at the loop top has the same convention)
            save_rolling(eval_slices)
        if stop_early:
            log_fn("no improvement, exit")
            break
        if opt.max_epochs != -1 and epoch >= opt.max_epochs:
            break
        if max_iterations is not None and iteration >= max_iterations:
            break

    result = {"params": params, "loss_histories": loss_histories, "model": model}

    # epilogue preemption verdict must be COLLECTIVE: a SIGTERM landing on
    # one host after its last in-loop guard.sync() would otherwise make
    # hosts diverge on whether the final eval (and its -best writes) runs.
    # Every host exits the loop at the same boundary (stop conditions are
    # collective), so this one extra sync stays call-count aligned.
    preempted = guard.sync()

    # the saved '-best' artifacts need at least one scored snapshot per seed
    # — but NOT under preemption: the rolling saves above already persisted
    # the state, and a full fleet eval would outlive the grace window
    # (eval_seeds itself writes the per-seed -best files at improvement time)
    if not preempted and (
        eval_at_end
        or (save and any(best_params[r] is None for r in local_seeds))
    ):
        eval_seeds(iteration)
    result["cider_per_seed"] = list(best_scores)
    result["val_histories"] = val_histories
    result["best_params"] = best_params
    result["local_seeds"] = list(local_seeds)
    getattr(_ckpt, "wait_until_finished", lambda: None)()  # async barrier
    guard.close()
    return result


def train_multi_seed_rl(
    opt,
    loader,
    cider_scorer,
    n_seeds: int,
    *,
    max_iterations: Optional[int] = None,
    eval_at_end: bool = True,
    save: bool = True,
    mesh=None,
    log_fn=print,
):
    """Vmapped multi-seed SCST fleet — the ensemble-production phase.

    The reference produces its 8 RL ensemble members as 8 sequential
    single-GPU jobs (train_recurrent_fusion_model_rl.sh:16-36), each warm-
    started from its seed's XE best checkpoint. Here all N seeds run as ONE
    program: per-seed params/optimizer states carry a leading seed axis, the
    multinomial + greedy rollouts are vmapped over it (per-seed RNG streams,
    shared feature batch), rewards are scored per seed on the host, and the
    policy-gradient step is vmapped back over the seed axis.

    Warm start: when opt.start_from is set, seed r loads the XE '-best'
    checkpoint of rank r (same per-rank naming the reference uses).

    Resume: with opt.rl_resume AND opt.start_from, the fleet instead
    continues bitwise-exactly from its own rolling rl_ per-seed
    checkpoints (periodic or preemption saves) — moments always restored,
    per-seed RNG chains and rl_lr_base reproduced. Any seed can equally be
    finished solo (train_rl --rl_resume, rank=r).

    Seed r's trajectory is identical to a solo train_rl run with rank=r on
    the same data stream (vmap is semantics-preserving; verified in tests).
    Returns a dict with stacked params, per-seed reward histories, and best
    checkpoints gated on validation score like the solo loop.
    mesh: optional 1-D 'dp' mesh sharding the seed axis across devices
    (fleet-over-mesh; see module docstring).
    """
    from .train_rl_loop import make_rl_step
    from ..rewards.self_critical import compute_reward

    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length
    model = setup(opt)
    _ckpt = checkpoint_backend(opt)
    # fleet checkpoints are HOST-LOCAL: each host saves only its own seeds'
    # files (per-rank paths), independently and possibly a different number
    # of times per boundary (improvement-gated -best saves). Orbax saves
    # are collective — every process must join a barrier per save — so the
    # two are structurally incompatible past one process.
    if jax.process_count() > 1 and getattr(_ckpt, "collective", False):
        raise ValueError(
            "multi-host fleets need --checkpoint_backend pickle: per-seed "
            "checkpoint files are host-local, but orbax saves run a "
            "cross-process barrier per save (counts/paths diverge)"
        )
    rl_crit = make_rl_criterion(opt)
    tx = make_optimizer(opt)

    # Per-seed RNG discipline mirrors train_rl: key(seed+r) -> split(init, run)
    base_keys = jnp.stack(
        [jax.random.PRNGKey(opt.seed + r) for r in range(n_seeds)]
    )
    split_keys = jax.vmap(jax.random.split)(base_keys)  # (S, 2, key)
    run_rngs, init_rngs = split_keys[:, 0], split_keys[:, 1]

    # HBM discipline: the flagship RFNet is ~440M params (1.76 GB f32), so a
    # fleet's params + adam moments already claim 3x fleet-size of HBM. Never
    # materialize a throwaway random-init fleet when warm-starting, and never
    # allocate zero moments that a checkpoint restore immediately replaces —
    # those transients pushed a 2-seed flagship fleet past a 16 GB chip.
    rl_lr_bases = np.full(n_seeds, opt.optim_rl_lr, np.float64)
    warm_start_params = [None] * n_seeds
    warm_start_scores = [None] * n_seeds
    saved_opt_states = [None] * n_seeds
    # moments to pair with a shipped never-improved -best when
    # saved_opt_states holds something else (the rl_resume fallback:
    # saved_opt_states are the ROLLING RL moments, the XE fallback params
    # need their XE moments)
    ship_opt_states = [None] * n_seeds
    resume_infos = None
    rl_resume = bool(getattr(opt, "rl_resume", 0)) and opt.start_from is not None
    if rl_resume:
        # Fleet RL resume: continue THIS SCST fleet from its own rolling
        # rl_ per-seed checkpoints (preemption/crash recovery), same
        # semantics as solo train_rl --rl_resume — moments always restored,
        # per-seed RNG chains continued, rl_lr_base reproduced exactly.
        per_seed = []
        resume_infos = []
        for r in range(n_seeds):
            p, s, infos_r = _ckpt.load_checkpoint(
                opt.start_from, opt.load_model_id, r, best=False, prefix="rl_"
            )
            per_seed.append(p)
            saved_opt_states[r] = s
            resume_infos.append(infos_r)
            if "rl_lr_base" in infos_r:
                rl_lr_bases[r] = infos_r["rl_lr_base"]
            # else: legacy checkpoint without the recorded base — keep the
            # configured optim_rl_lr (the lr_history is XE-contaminated and
            # cannot recover it; see train_rl's fallback rationale)
            if opt.load_best_score:
                warm_start_scores[r] = infos_r.get("best_val_score", None)
            # The ship--best contract ("a seed whose SCST phase never beats
            # its warm-start val best still ships an rl_-best = its XE
            # weights", epilogue below) must survive preemption+resume: a
            # fleet preempted BEFORE any rl_-best write resumes here with
            # no shippable snapshot, and a never-improving resumed run
            # would end with no rl_-best file at all (the dry runbook's
            # eval stage hit exactly this). When no rl_-best exists yet,
            # reload the XE -best as the fallback snapshot — params AND
            # moments, so the shipped pair stays XE/XE like the fresh path.
            # The rl_-best probe targets checkpoint_path: that is where this
            # run's epilogue writes and where eval_ensemble --rl_prefix
            # looks. Guarded on the XE -best existing: a from-scratch RL
            # fleet (never XE-warm-started) resumes from a dir holding only
            # its own rolling rl_ files, and has no privileged snapshot —
            # its first eval establishes -best as before.
            if not _ckpt.has_checkpoint(opt.checkpoint_path, opt.id,
                                        r, best=True, prefix="rl_") \
                    and _ckpt.has_checkpoint(opt.start_from,
                                             opt.load_model_id, r, best=True):
                xe_p, xe_s, _ = _ckpt.load_checkpoint(
                    opt.start_from, opt.load_model_id, r, best=True
                )
                warm_start_params[r] = xe_p
                ship_opt_states[r] = xe_s
        _assert_arch_matches(opt, resume_infos[0].get("opt", {}))
        params = _stack_seed_trees(per_seed)
        del per_seed
        if all("rng_key" in i for i in resume_infos):
            run_rngs = jnp.stack(
                [jnp.asarray(i["rng_key"]) for i in resume_infos]
            )
        if "iterators" in resume_infos[0]:
            loader.restore_state(
                resume_infos[0]["iterators"],
                resume_infos[0]["split_image_id"],
                resume_infos[0].get("loader_rng"),
            )
    elif opt.start_from is not None:
        per_seed, lr_hists = [], []
        for r in range(n_seeds):
            p, s, infos_r = _ckpt.load_checkpoint(
                opt.start_from, opt.load_model_id, r, best=True
            )
            # warm starts need the same structural validation the resume
            # branches get (a use_mos/tied mismatch decodes garbage or
            # KeyErrors deep inside the vmapped rollout)
            _assert_arch_matches(opt, infos_r.get("opt", {}))
            per_seed.append(p)
            saved_opt_states[r] = s
            lr_hists.append(infos_r.get("lr_history", {}))
            # reference semantics (train_rl.py + --load_best_score): the RL
            # phase's best gate starts from the XE best score, so an RL run
            # that never improves ships the warm-start weights, not a
            # degraded late checkpoint
            warm_start_params[r] = p
            if opt.load_best_score:
                warm_start_scores[r] = infos_r.get("best_val_score", None)
        params = _stack_seed_trees(per_seed)
        del per_seed
        if opt.load_lr:
            for r, h in enumerate(lr_hists):
                if h:
                    rl_lr_bases[r] = min(h.values()) / opt.optim_rl_lr_ratio
    else:
        params = jax.vmap(model.init_params)(init_rngs)
    opt_state = None
    if (opt.load_lr or rl_resume) and all(
            s is not None for s in saved_opt_states):
        # reference semantics: the optimizer is restored only under
        # --load_lr (train_rl.py:96-98) — same as the solo loop. The
        # structure template is abstract (eval_shape): adopt_structure only
        # needs treedef + shapes, so no device moments are allocated here.
        from .checkpoint import adopt_structure

        template = jax.eval_shape(
            tx.init,
            jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape[1:], x.dtype), params
            ),
        )
        try:
            opt_state = _stack_seed_trees(
                [adopt_structure(template, s) for s in saved_opt_states]
            )
        except AssertionError:
            print("warning: checkpoint optimizer state incompatible; "
                  "re-initialized")
    if opt_state is None:
        opt_state = jax.vmap(tx.init)(params)
    if mesh is not None:
        params, opt_state, run_rngs = _shard_seed_axis(
            mesh, n_seeds, params, opt_state, run_rngs
        )

    # the rollout is the SAME fused 2B-lane sampled+greedy scan as the solo
    # loop — literally the same function (make_rollout_fn jit=False), vmapped
    # over the seed axis, so fleet seed trajectories cannot drift from solo
    from .train_rl_loop import make_rollout_fn

    vrollout = jax.jit(
        jax.vmap(make_rollout_fn(model, jit=False), in_axes=(0, None, None, 0))
    )

    spice_fn = None
    if opt.spice_weight > 0:
        from ..metrics.spice import make_spice_fn

        spice_fn = make_spice_fn(opt, loader.get_vocab())

    step_fun, old_fun = make_rl_step(model, rl_crit, tx, jit=False)
    vstep = jax.jit(
        jax.vmap(step_fun, in_axes=(0, 0, None, None, 0, 0, None, 0, 0)),
        donate_argnums=(0, 1),  # in-place param/opt-state update
    )
    vold = jax.jit(jax.vmap(old_fun, in_axes=(0, None, None, 0)))

    # per-host seed ownership (see train_multi_seed): rollout scoring, eval,
    # best tracking, and checkpointing run over each host's local seed block
    local_seeds = (
        _local_seed_ids(mesh, n_seeds)
        if mesh is not None and jax.process_count() > 1
        else list(range(n_seeds))
    )
    iteration, epoch = 0, 0
    reward_histories = [dict() for _ in range(n_seeds)]
    best_scores = list(warm_start_scores)
    best_params = list(warm_start_params)
    best_opt_states = [None] * n_seeds
    val_histories = [dict() for _ in range(n_seeds)]
    if resume_infos is not None:
        iteration = resume_infos[0].get("iter", 0)
        epoch = resume_infos[0].get("epoch", 0)
        reward_histories = [
            dict(i.get("loss_history", {})) for i in resume_infos
        ]
        val_histories = [
            dict(i.get("val_result_history", {})) for i in resume_infos
        ]
    update_lr_flag = True
    lrs = jnp.asarray(rl_lr_bases, jnp.float32)
    no_improve = [0] * n_seeds  # per-seed stagnant-eval counters
    if resume_infos is not None:  # survive resume (see train_multi_seed)
        no_improve = [int(i.get("no_improve", 0)) for i in resume_infos]

    def seed_slice(r, tree=None):
        tree = params if tree is None else tree
        return jax.tree_util.tree_map(lambda x: _seed_row(x, r), tree)

    def fleet_stagnant():
        # every seed stagnant for num_eval_no_improve evals -> stop (the
        # reference's per-job early stop across the fleet; collective on
        # multi-host — see train_multi_seed.fleet_stagnant)
        from ..parallel.distributed import all_hosts_agree

        return all_hosts_agree(
            all(no_improve[r] >= opt.num_eval_no_improve
                for r in local_seeds)
        )

    best_written = [False] * n_seeds  # which seeds have an rl_-best file

    def seed_infos(r):
        return {
            "iter": iteration,
            "epoch": epoch,
            "iterators": dict(loader.iterators),
            "split_image_id": {s: list(v) for s, v in loader.split_image_id.items()},
            "loader_rng": dict(loader.rng_states),  # draw-exact resume
            "opt": dict(vars(opt)),
            "loss_history": reward_histories[r],
            "rl_lr_base": float(rl_lr_bases[r]),
            "val_result_history": val_histories[r],
            "best_val_score": best_scores[r],
            "no_improve": no_improve[r],  # early-stop progress
            "rng_key": _seed_row(run_rngs, r),  # resume continues the chain
            "vocab": loader.get_vocab(),
        }

    def eval_seeds(at_iter):
        # returns ({r: host params}, {r: host opt state}) so a rolling save
        # at the same boundary reuses the copies instead of a second full
        # device->host readback (flagship scale: 1.76 GB params + 3.5 GB
        # adam moments per seed through the tunnel). Moments are only
        # materialized for seeds that improved (the -best save needs them);
        # non-improving seeds' moments are sliced lazily by save_rolling.
        host_params, host_opts = {}, {}
        for r in local_seeds:
            p = host_params[r] = seed_slice(r)
            val_loss, _, stats = eval_split(
                model, p, loader, opt, split="val", rank=r,
                language_eval_flag=bool(opt.language_eval),
            )
            score = stats["CIDEr"] if stats else -val_loss
            val_histories[r][at_iter] = {"loss": val_loss, "lang_stats": stats}
            if best_scores[r] is None or score > best_scores[r]:
                no_improve[r] = 1
                best_scores[r] = score
                best_params[r] = p
                best_opt_states[r] = host_opts[r] = seed_slice(r, opt_state)
                if save:
                    # persist rl_-best at improvement time (see the XE
                    # fleet's eval_seeds): the ensemble member must survive
                    # a later crash/preemption
                    best_written[r] = True
                    _ckpt.save_checkpoint(
                        opt.checkpoint_path, opt.id, r,
                        params=best_params[r], opt_state=best_opt_states[r],
                        infos=seed_infos(r), best=True, prefix="rl_",
                    )
            else:
                no_improve[r] += 1
        log_fn(
            f"iter {at_iter} rl fleet val scores: "
            + " ".join("-" if best_scores[r] is None else
                       f"{best_scores[r]:.3f}" for r in local_seeds)
        )
        return host_params, host_opts

    def save_rolling(eval_slices=None):
        # rolling rl_ per-seed files, solo train_rl naming: the fleet
        # resumes as a fleet (--rl_resume --start_from) or any seed solo
        # (train_rl --rl_resume, rank=r) — rl_lr_base and the per-seed RNG
        # chain ride in infos for the exact restore. eval_slices: the
        # (host_params, host_opts) copies eval_seeds materialized at this
        # same boundary, reused to skip duplicate device->host readbacks.
        host_params, host_opts = eval_slices if eval_slices else ({}, {})
        for r in local_seeds:
            # pop as consumed: a non-improving seed's host params are freed
            # right after its write instead of pinning every local seed's
            # 1.76 GB copy until the whole loop finishes (improved seeds'
            # slices stay alive via best_params/best_opt_states by design)
            p = host_params.pop(r) if r in host_params else seed_slice(r)
            o = host_opts.pop(r) if r in host_opts else seed_slice(r, opt_state)
            _ckpt.save_checkpoint(
                opt.checkpoint_path, opt.id, r,
                params=p, opt_state=o,
                infos=seed_infos(r), best=False, prefix="rl_",
            )

    from .preempt import PreemptGuard

    guard = PreemptGuard.from_opt(opt)

    while True:
        if guard.sync():
            # persist FIRST inside the grace window (see train_multi_seed)
            if save:
                log_fn(
                    "preempted — saving rolling rl per-seed checkpoints at "
                    f"iter {iteration}"
                )
                save_rolling()
            break
        if update_lr_flag:
            lrs = jnp.asarray(
                [lr_for_epoch(opt, epoch, b) for b in rl_lr_bases], jnp.float32
            )
            update_lr_flag = False
        data = loader.get_batch("train")
        fc, att = batch_feats(data)
        top_words = jnp.asarray(data["top_words"])

        sk = jax.vmap(jax.random.split)(run_rngs)
        run_rngs, roll_rngs = sk[:, 0], sk[:, 1]
        seqs, greedy_seqs = vrollout(params, fc, att, roll_rngs)

        # score each host's LOCAL seed rows only (multi-process: non-local
        # rollout shards are not addressable; every host sees the full data
        # stream so gts are shared) — the fleet analogue of the solo loop's
        # _local_rows reward scoring
        local_rewards = {
            r: compute_reward(
                cider_scorer, _seed_row(seqs, r), _seed_row(greedy_seqs, r),
                data["gts"],
                use_baseline=bool(opt.use_baseline),
                cider_weight=opt.cider_weight,
                bleu4_weight=opt.bleu4_weight,
                spice_weight=opt.spice_weight,
                spice_fn=spice_fn,
            )
            for r in local_seeds
        }
        row_shape = next(iter(local_rewards.values())).shape
        rewards = np.zeros((n_seeds,) + row_shape, np.float32)
        for r, v in local_rewards.items():
            rewards[r] = v
        if mesh is not None:
            # multi-process: the callback materializes only local seed rows,
            # so the zero placeholders for remote seeds never reach a device
            reward_dev = _shard_seed_axis(mesh, n_seeds, rewards)
        else:
            reward_dev = jnp.asarray(rewards, jnp.float32)

        if opt.use_ppo:
            slp_old = jax.lax.stop_gradient(vold(params, fc, att, seqs))
            for _ in range(1 + opt.ppo_k):
                params, opt_state, losses = vstep(
                    params, opt_state, fc, att, seqs, reward_dev, top_words,
                    lrs, slp_old,
                )
        else:
            params, opt_state, losses = vstep(
                params, opt_state, fc, att, seqs, reward_dev, top_words,
                lrs, jnp.zeros_like(reward_dev),
            )

        if data["bounds"]["wrapped"]:
            epoch += 1
            update_lr_flag = True
        if iteration % opt.losses_log_every == 0:
            avg_r = {r: float(local_rewards[r][:, 0].mean())
                     for r in local_seeds}
            for r, v in avg_r.items():
                reward_histories[r][iteration] = v
            log_fn(
                f"rl iter {iteration} (epoch {epoch}) avg rewards: "
                + " ".join(f"{v:.3f}" for v in avg_r.values())
            )
        periodic_save = (
            save and iteration % opt.save_checkpoint_every == 0
            and iteration > 0
        )
        stop_early = False
        eval_slices = None
        if iteration % opt.save_checkpoint_every == 0 and iteration > 0:
            eval_slices = eval_seeds(iteration)
            stop_early = fleet_stagnant()
        iteration += 1
        if periodic_save:
            # AFTER the increment (same convention as the preemption save
            # at the loop top): the snapshot's iter is the next step to run
            save_rolling(eval_slices)
        if stop_early:
            log_fn("no improvement, exit")
            break
        if opt.max_epochs != -1 and epoch >= opt.max_epochs:
            break
        if max_iterations is not None and iteration >= max_iterations:
            break

    result = {
        "params": params,
        "reward_histories": reward_histories,
        "model": model,
    }
    # epilogue preemption verdict is COLLECTIVE (see train_multi_seed):
    # one aligned extra sync, so hosts agree on whether the final eval and
    # the ship--best block run.
    preempted = guard.sync()
    # no post-preemption eval: the rolling saves already persisted the
    # state, and a full fleet eval would outlive the grace window
    # (eval_seeds itself writes the rl_-best files at improvement time)
    if not preempted and (
        eval_at_end
        or (save and any(best_params[r] is None for r in local_seeds))
    ):
        eval_seeds(iteration)
    result["cider_per_seed"] = list(best_scores)
    result["val_histories"] = val_histories
    result["best_params"] = best_params
    result["local_seeds"] = list(local_seeds)
    if save and not preempted:
        # a warm-started seed that never beat its XE best score still ships
        # an rl_-best file (its XE weights) so the rl_ ensemble is complete
        # for eval_ensemble --rl_prefix over every rank; under --rl_resume
        # the earlier run's rl_-best files already stand
        for r in local_seeds:
            if best_params[r] is not None and not best_written[r]:
                # a never-improved seed has no RL moments (best_opt_states[r]
                # is None); ship its XE warm-start moments instead of
                # omitting the optimizer file — omission would leave any
                # stale rl_optimizer-best from an earlier run paired with
                # the fresh model file
                _ship_opt = best_opt_states[r]
                if _ship_opt is None:
                    _ship_opt = ship_opt_states[r]
                if _ship_opt is None:
                    _ship_opt = saved_opt_states[r]
                _ckpt.save_checkpoint(
                    opt.checkpoint_path, opt.id, r,
                    params=best_params[r],
                    opt_state=_ship_opt,
                    infos=seed_infos(r), best=True, prefix="rl_",
                )
    getattr(_ckpt, "wait_until_finished", lambda: None)()  # async barrier
    guard.close()
    return result
