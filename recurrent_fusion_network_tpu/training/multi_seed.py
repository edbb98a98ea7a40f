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


def _shard_seed_axis(mesh, n_seeds, *trees):
    """device_put each tree with its leading (seed) axis split over the
    mesh's 'dp' axis; returns the trees in order."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    d = mesh.shape["dp"]
    assert n_seeds % d == 0, (
        f"n_seeds {n_seeds} must divide by the mesh size {d}"
    )
    # host-side readback (reward scoring, seed_slice) uses np.asarray on the
    # seed-sharded arrays, which needs every shard addressable locally; a
    # multi-process fleet would need per-host seed scoring (cf.
    # train_rl_loop._local_rows) — not implemented, fail loudly instead
    assert jax.process_count() == 1, (
        "fleet-over-mesh supports single-process meshes only; use one fleet "
        "process per host or the dp-sharded solo loops for multi-host"
    )
    sharding = NamedSharding(mesh, P("dp"))
    out = tuple(
        jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), t)
        for t in trees
    )
    return out if len(out) > 1 else out[0]


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
    (fleet-over-mesh; see module docstring)."""
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length
    model = setup(opt)
    _ckpt = checkpoint_backend(opt)
    crit = make_criterion(opt)
    tx = make_optimizer(opt)

    # per-seed base key -> (run, init) split, same discipline as the RL
    # fleet: the init key and the run chain never share threefry streams
    base_keys = jnp.stack(
        [jax.random.PRNGKey(opt.seed + r) for r in range(n_seeds)]
    )
    split_keys = jax.vmap(jax.random.split)(base_keys)  # (S, 2, key)
    rngs, init_rngs = split_keys[:, 0], split_keys[:, 1]
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
    lr = opt.optim_lr
    ss = 0.0
    update_lr_flag = True

    def seed_slice(r, tree=None):
        tree = params if tree is None else tree
        return jax.tree_util.tree_map(lambda x: np.asarray(x[r]), tree)

    def eval_seeds(at_iter):
        for r in range(n_seeds):
            p = seed_slice(r)
            val_loss, _, stats = eval_split(
                model, p, loader, opt, split="val", rank=r,
                language_eval_flag=bool(opt.language_eval),
            )
            score = stats["CIDEr"] if stats else -val_loss
            val_histories[r][at_iter] = {"loss": val_loss, "lang_stats": stats}
            if best_scores[r] is None or score > best_scores[r]:
                best_scores[r] = score
                best_params[r] = p
                best_opt_states[r] = seed_slice(r, opt_state)
        log_fn(
            f"iter {at_iter} fleet val scores: "
            + " ".join(f"{s:.3f}" for s in best_scores)
        )

    while True:
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
            for r in range(n_seeds):
                loss_histories[r][iteration] = float(losses[r])
            lr_history[iteration] = lr
            log_fn(
                f"iter {iteration} (epoch {epoch}) losses: "
                + " ".join(f"{float(l):.3f}" for l in losses)
            )
        if iteration % opt.save_checkpoint_every == 0 and iteration > 0:
            eval_seeds(iteration)
        iteration += 1
        if opt.max_epochs != -1 and epoch >= opt.max_epochs:
            break
        if max_iterations is not None and iteration >= max_iterations:
            break

    result = {"params": params, "loss_histories": loss_histories, "model": model}

    # the saved '-best' artifacts need at least one scored snapshot per seed
    if eval_at_end or (save and any(p is None for p in best_params)):
        eval_seeds(iteration)
    result["cider_per_seed"] = list(best_scores)
    result["val_histories"] = val_histories
    result["best_params"] = best_params
    if save:
        for r in range(n_seeds):
            infos = {
                "iter": iteration,
                "epoch": epoch,
                "opt": dict(vars(opt)),
                "loss_history": loss_histories[r],
                "lr_history": dict(lr_history),
                "val_result_history": val_histories[r],
                "best_val_score": best_scores[r],
                "vocab": loader.get_vocab(),
            }
            _ckpt.save_checkpoint(
                opt.checkpoint_path, opt.id, r,
                params=best_params[r], opt_state=best_opt_states[r],
                infos=infos, best=True,
            )
    getattr(_ckpt, "wait_until_finished", lambda: None)()  # async barrier
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
    rl_crit = make_rl_criterion(opt)
    tx = make_optimizer(opt)

    # Per-seed RNG discipline mirrors train_rl: key(seed+r) -> split(init, run)
    base_keys = jnp.stack(
        [jax.random.PRNGKey(opt.seed + r) for r in range(n_seeds)]
    )
    split_keys = jax.vmap(jax.random.split)(base_keys)  # (S, 2, key)
    run_rngs, init_rngs = split_keys[:, 0], split_keys[:, 1]
    params = jax.vmap(model.init_params)(init_rngs)

    rl_lr_bases = np.full(n_seeds, opt.optim_rl_lr, np.float64)
    warm_start_params = [None] * n_seeds
    warm_start_scores = [None] * n_seeds
    saved_opt_states = [None] * n_seeds
    if opt.start_from is not None:
        per_seed, lr_hists = [], []
        for r in range(n_seeds):
            p, s, infos_r = _ckpt.load_checkpoint(
                opt.start_from, opt.load_model_id, r, best=True
            )
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
        params = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *per_seed
        )
        if opt.load_lr:
            for r, h in enumerate(lr_hists):
                if h:
                    rl_lr_bases[r] = min(h.values()) / opt.optim_rl_lr_ratio
    opt_state = jax.vmap(tx.init)(params)
    if opt.load_lr and all(s is not None for s in saved_opt_states):
        # reference semantics: the optimizer is restored only under
        # --load_lr (train_rl.py:96-98) — same as the solo loop
        from .checkpoint import adopt_structure

        template = tx.init(jax.tree_util.tree_map(lambda x: x[0], params))
        try:
            adopted = [adopt_structure(template, s) for s in saved_opt_states]
            opt_state = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *adopted
            )
        except AssertionError:
            print("warning: checkpoint optimizer state incompatible; "
                  "re-initialized")
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

    iteration, epoch = 0, 0
    reward_histories = [dict() for _ in range(n_seeds)]
    best_scores = list(warm_start_scores)
    best_params = list(warm_start_params)
    best_opt_states = [None] * n_seeds
    val_histories = [dict() for _ in range(n_seeds)]
    update_lr_flag = True
    lrs = jnp.asarray(rl_lr_bases, jnp.float32)

    def seed_slice(r, tree=None):
        tree = params if tree is None else tree
        return jax.tree_util.tree_map(lambda x: np.asarray(x[r]), tree)

    def eval_seeds(at_iter):
        for r in range(n_seeds):
            p = seed_slice(r)
            val_loss, _, stats = eval_split(
                model, p, loader, opt, split="val", rank=r,
                language_eval_flag=bool(opt.language_eval),
            )
            score = stats["CIDEr"] if stats else -val_loss
            val_histories[r][at_iter] = {"loss": val_loss, "lang_stats": stats}
            if best_scores[r] is None or score > best_scores[r]:
                best_scores[r] = score
                best_params[r] = p
                best_opt_states[r] = seed_slice(r, opt_state)
        log_fn(
            f"iter {at_iter} rl fleet val scores: "
            + " ".join(f"{s:.3f}" for s in best_scores)
        )

    while True:
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
        seqs_np, greedy_np = np.asarray(seqs), np.asarray(greedy_seqs)

        rewards = np.stack([
            compute_reward(
                cider_scorer, seqs_np[r], greedy_np[r], data["gts"],
                use_baseline=bool(opt.use_baseline),
                cider_weight=opt.cider_weight,
                bleu4_weight=opt.bleu4_weight,
                spice_weight=opt.spice_weight,
                spice_fn=spice_fn,
            )
            for r in range(n_seeds)
        ])
        reward_dev = jnp.asarray(rewards, jnp.float32)
        if mesh is not None:
            reward_dev = _shard_seed_axis(mesh, n_seeds, reward_dev)

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
            avg_r = rewards[:, :, 0].mean(axis=1)
            for r in range(n_seeds):
                reward_histories[r][iteration] = float(avg_r[r])
            log_fn(
                f"rl iter {iteration} (epoch {epoch}) avg rewards: "
                + " ".join(f"{v:.3f}" for v in avg_r)
            )
        if iteration % opt.save_checkpoint_every == 0 and iteration > 0:
            eval_seeds(iteration)
        iteration += 1
        if opt.max_epochs != -1 and epoch >= opt.max_epochs:
            break
        if max_iterations is not None and iteration >= max_iterations:
            break

    result = {
        "params": params,
        "reward_histories": reward_histories,
        "model": model,
    }
    if eval_at_end or (save and any(p is None for p in best_params)):
        eval_seeds(iteration)
    result["cider_per_seed"] = list(best_scores)
    result["val_histories"] = val_histories
    result["best_params"] = best_params
    if save:
        for r in range(n_seeds):
            infos = {
                "iter": iteration,
                "epoch": epoch,
                "opt": dict(vars(opt)),
                "loss_history": reward_histories[r],
                "val_result_history": val_histories[r],
                "best_val_score": best_scores[r],
                "vocab": loader.get_vocab(),
            }
            _ckpt.save_checkpoint(
                opt.checkpoint_path, opt.id, r,
                params=best_params[r], opt_state=best_opt_states[r],
                infos=infos, best=True, prefix="rl_",
            )
    getattr(_ckpt, "wait_until_finished", lambda: None)()  # async barrier
    return result
