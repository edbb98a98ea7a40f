"""Self-critical (SCST) RL training driver.

Equivalent of the reference's main_rl.py + train_rl.py: per iteration a
multinomial rollout, a greedy baseline rollout, CIDEr-D(±BLEU4/SPICE) rewards
with baseline subtraction (get_rewards.py), and the policy-gradient criterion
with entropy regularization and optional PPO (train_rl.py:147-201). Warm
starts from the XE best checkpoint with optional LR derivation from the XE
LR history (train_rl.py:48-50).

TPU-first split of the reference's single differentiable-sampling graph:

  1. one jitted ROLLOUT (no grad): encode once, then multinomial + greedy
     decodes sharing the encoded memory;
  2. host-side vectorized CIDEr-D rewards on the sampled ids;
  3. one jitted GRAD step that re-evaluates the sampled sequence with teacher
     forcing — because the decoder is autoregressive, feeding the sampled
     tokens reproduces exactly the rollout's per-step distributions at every
     step the SCST mask keeps, so gradients match the reference's
     retained-graph backward.

Rollouts here are deterministic-mode (no dropout): JAX cannot share dropout
draws between the rollout and the grad re-evaluation, and stochastic-policy
SCST requires the evaluated policy to be the sampled one. (The reference
samples under live dropout, which silently mismatches its own retained
graph's second use — this implementation is the consistent version.)

PPO (`--use_ppo`): the reference re-backprops the SAME stale graph ppo_k
times (train_rl.py:194-200); here the intended clipped-surrogate semantics
are implemented — each of the ppo_k extra steps re-evaluates the ratio
against the frozen rollout log-probs with the CURRENT parameters.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..decoding.engine import make_step_fn
from ..decoding.sample import sample
from ..models import setup
from ..rewards.cider_d import CiderD
from ..rewards.self_critical import compute_reward
from .checkpoint import backend as checkpoint_backend
from .criterion import make_rl_criterion
from .eval_split import batch_feats, eval_split
from .optim import apply_updates, lr_for_epoch, make_optimizer


def _local_rows(arr) -> np.ndarray:
    """This process's rows of a (possibly multi-host dp-sharded) array, in
    row order. For multi-process global arrays only the addressable shards
    are gathered — exactly the rows whose gts this host's loader
    materialized (loader host_shard and the process-major dp mesh use the
    same contiguous-block layout). Replicated shards dedupe by row offset."""
    shards = getattr(arr, "addressable_shards", None)
    if not shards:
        return np.asarray(arr)
    by_start = {}
    for s in shards:
        start = s.index[0].start or 0
        by_start.setdefault(start, s)
    ordered = [by_start[k] for k in sorted(by_start)]
    return np.concatenate([np.asarray(s.data) for s in ordered], axis=0)


def make_rollout_fn(model, jit: bool = True):
    """Jitted: (params, fc, att, rng) -> (sampled seq, greedy seq).

    The multinomial rollout and its greedy baseline run as ONE scan over 2B
    stacked lanes (rows 0..B-1 multinomial, B..2B-1 greedy) — the two decodes
    share every per-step weight read and the matmuls run at double width,
    instead of the reference's two sequential full rollouts
    (train_rl.py:149-182 + get_rewards.py:122-126).
    jit=False returns the raw function so callers can vmap it first
    (multi_seed.train_multi_seed_rl — one rollout definition, no drift).
    """

    def rollout(params, fc, att, rng):
        enc = model.encode(params, fc, att)
        state2 = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x, x], axis=0), enc.state
        )
        mem2 = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x, x], axis=0), enc.memory
        )
        step = make_step_fn(model, params, mem2)
        fc0 = fc[0] if isinstance(fc, (list, tuple)) else fc
        B = fc0.shape[0]
        V1 = model.vocab_size + 1
        greedy_mask = jnp.arange(2 * B) >= B
        out = sample(step, state2, 2 * B, model.seq_length, V1,
                     rng=rng, greedy_mask=greedy_mask)
        return out.seq[:B], out.seq[B:]

    return jax.jit(rollout) if jit else rollout


def make_rl_step(model, rl_crit, tx, jit: bool = True):
    """Teacher-forced re-evaluation + policy-gradient update. Returns
    (step, old_logprobs); jit=False returns the raw functions so callers can
    vmap them first (multi_seed.train_multi_seed_rl)."""

    def seq_to_inputs(seq):
        B, L = seq.shape
        full = jnp.zeros((B, L + 2), seq.dtype)
        return full.at[:, 1 : L + 1].set(seq)

    def losses_of(params, fc, att, seq, reward, top_words, sample_logprobs_old):
        lps, reason = model.forward(params, fc, att, seq_to_inputs(seq))
        L = seq.shape[1]
        sample_logprobs = jnp.take_along_axis(
            lps[:, :L, :], seq[..., None], axis=2
        )[..., 0]
        return rl_crit(
            sample_logprobs, seq, reward, lps, reason, top_words, sample_logprobs_old
        )

    def step(params, opt_state, fc, att, seq, reward, top_words, lr,
             sample_logprobs_old):
        loss, grads = jax.value_and_grad(losses_of)(
            params, fc, att, seq, reward, top_words, sample_logprobs_old
        )
        direction, opt_state = tx.update(grads, opt_state, params)
        params = apply_updates(params, direction, lr)
        return params, opt_state, loss

    def old_logprobs(params, fc, att, seq):
        lps, _ = model.forward(params, fc, att, seq_to_inputs(seq))
        L = seq.shape[1]
        return jnp.take_along_axis(lps[:, :L, :], seq[..., None], axis=2)[..., 0]

    if not jit:
        return step, old_logprobs
    # donate params + opt_state (in-place update; see make_train_step)
    return jax.jit(step, donate_argnums=(0, 1)), jax.jit(old_logprobs)


def train_rl(
    opt,
    loader,
    cider_scorer: CiderD,
    *,
    rank: int = 0,
    max_iterations: Optional[int] = None,
    mesh=None,
    log_fn=print,
):
    """Run SCST training. Returns the infos dict.

    mesh: optional jax.sharding.Mesh with a 'dp' axis — same contract as the
    XE loop (train_loop.train): parameters replicated, the rollout batch and
    the gradient step's inputs sharded over 'dp', gradient all-reduce inserted
    by GSPMD. Reward scoring stays host-side on the gathered sampled ids (the
    device->host readback of the sampled sequences is required anyway for the
    n-gram scorer, so DP adds no extra transfer).
    """
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length
    model = setup(opt)
    _ckpt = checkpoint_backend(opt)

    rng = jax.random.PRNGKey(opt.seed + rank)
    rng, init_rng = jax.random.split(rng)

    infos = {}
    saved_opt_state = None
    rl_resume = bool(getattr(opt, "rl_resume", 0)) and opt.start_from is not None
    if opt.start_from is not None:
        # warm start replaces the params entirely — don't materialize a
        # throwaway 1.76 GB random init on device first (HBM discipline;
        # init_rng is still split off so the run RNG chain is unchanged).
        # --rl_resume: continue THIS RL run from its own rolling rl_
        # checkpoints (preemption/crash recovery) instead of warm-starting
        # from the XE best — the reference has no such path (train_rl.py
        # always reloads the XE files, so a crashed RL run loses all RL
        # progress there).
        params, saved_opt_state, infos = _ckpt.load_checkpoint(
            opt.start_from, opt.load_model_id, rank,
            best=not rl_resume, prefix="rl_" if rl_resume else "",
        )
        # the reference's need_be_same check (train_rl.py loads train.py's
        # resume path): without it a use_mos/tied/dims mismatch between the
        # XE checkpoint and the RL CLI builds the wrong graph — a use_mos
        # mismatch is fully SILENT (the untrained logit head decodes
        # garbage rollouts), the rest die as opaque KeyErrors
        from .checkpoint import assert_arch_matches

        assert_arch_matches(opt, infos.get("opt", {}))
        if "iterators" in infos:
            loader.restore_state(infos["iterators"], infos["split_image_id"],
                                 infos.get("loader_rng"))
        if rl_resume and "rng_key" in infos:
            # a true resume continues the rollout RNG chain where the run
            # stopped; a warm start keeps its own fresh chain
            rng = jnp.asarray(infos["rng_key"])
    else:
        params = model.init_params(init_rng)

    iteration = infos.get("iter", 0)
    epoch = infos.get("epoch", 0)
    val_result_history = infos.get("val_result_history", {})
    loss_history = infos.get("loss_history", {})
    lr_history = infos.get("lr_history", {})
    best_val_score = infos.get("best_val_score", None) if opt.load_best_score else None

    rl_lr_base = opt.optim_rl_lr
    if rl_resume:
        if "rl_lr_base" in infos:
            # reproduce the original run's base exactly (it may itself have
            # been derived from the XE lr history under --load_lr)
            rl_lr_base = infos["rl_lr_base"]
        else:
            # legacy rl_ checkpoint without the recorded base. The history
            # cannot recover it: lr_history was seeded from the XE warm
            # start's infos (line above) and then extended with RL values,
            # so max() returns the XE peak LR (~10x the RL base) and min()
            # a decayed RL value — both wrong. Fall back to the configured
            # base and say so.
            log_fn(
                "warning: rl checkpoint predates rl_lr_base; the original "
                "base is not recoverable from the (XE-contaminated) lr "
                f"history — resuming with --optim_rl_lr {rl_lr_base:.2e}"
            )
    elif opt.load_lr and lr_history:
        rl_lr_base = min(lr_history.values()) / opt.optim_rl_lr_ratio

    # SPICE reward hook: reference get_rewards.py:75-94 calls the external
    # SPICE service at opt.ip/opt.port when spice_weight > 0; here the
    # backend is selectable (--spice_backend approx|http, metrics/spice.py)
    spice_fn = None
    if opt.spice_weight > 0:
        from ..metrics.spice import make_spice_fn

        spice_fn = make_spice_fn(opt, loader.get_vocab())

    rl_crit = make_rl_criterion(opt)
    tx = make_optimizer(opt)
    opt_state = None
    if (opt.load_lr or rl_resume) and saved_opt_state is not None:
        # the reference restores the optimizer only under --load_lr
        # (train_rl.py:96-98); an --rl_resume is a true resume, so the
        # moments are always restored; the adoption template is abstract
        # so no throwaway zero moments are allocated on device
        from .checkpoint import adopt_structure

        try:
            opt_state = adopt_structure(
                jax.eval_shape(tx.init, params), saved_opt_state
            )
        except AssertionError:
            print("warning: checkpoint optimizer state incompatible; re-initialized")
    if opt_state is None:
        opt_state = tx.init(params)
    if mesh is not None:
        from ..parallel.mesh import replicate

        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
    rollout_fn = make_rollout_fn(model)
    rl_step, old_logprobs_fn = make_rl_step(model, rl_crit, tx)

    from ..utils.logging import JsonlLogger
    from ..utils.profiling import TraceWindow

    jlog = JsonlLogger(getattr(opt, "json_log", "") or None)
    trace = TraceWindow.from_opt(opt)

    from .preempt import PreemptGuard

    guard = PreemptGuard.from_opt(opt)

    # stagnant-eval counter survives resume (see train_loop)
    num_period_best = infos.get("num_period_best", 0) if rl_resume else 0
    current_score = 0.0
    update_lr_flag = True
    lr = rl_lr_base
    rewards = np.zeros((1, 1))

    def fetch_batch():
        data = loader.get_batch("train")
        multi = mesh is not None and jax.process_count() > 1
        fc, att = batch_feats(data, as_numpy=multi)
        top_words = (np if multi else jnp).asarray(data["top_words"])
        if mesh is not None:
            from ..parallel.distributed import global_dp_batch

            fc, att, top_words = global_dp_batch(mesh, (fc, att, top_words))
        return data, fc, att, top_words

    def snapshot_infos():
        # one infos builder for the periodic save and the preemption save.
        # iter records iteration+1 (the NEXT step to run) — see
        # train_loop.snapshot_infos: both saves run post-step, and the
        # pre-increment value made a resume re-fire the eval boundary.
        return {
            "iter": iteration + 1,
            "epoch": epoch,
            "iterators": dict(loader.iterators),
            "split_image_id": {s: list(v) for s, v in loader.split_image_id.items()},
            "loader_rng": dict(loader.rng_states),  # draw-exact resume
            "best_val_score": best_val_score,
            "opt": dict(vars(opt)),
            "val_result_history": val_result_history,
            "loss_history": loss_history,
            "lr_history": lr_history,
            "rl_lr_base": rl_lr_base,  # --rl_resume restores this base
            "num_period_best": num_period_best,  # early-stop progress
            "rng_key": np.asarray(rng),  # --rl_resume continues the chain
            "vocab": loader.get_vocab(),
        }

    # multi-host write discipline — see train_loop: one pickle writer
    # (process 0), but collective orbax saves run on every process
    save_here = getattr(_ckpt, "collective", False) or jax.process_index() == 0

    # Software pipeline (--rl_overlap, default on): the serial iteration is
    # a strict chain rollout_k -> host score_k -> step_k (on-policy SCST —
    # rollout_{k+1} needs step_k's params), so the host reward scorer cannot
    # overlap device compute. What CAN overlap with zero semantic change:
    # both dispatch round-trips and the loss readback. After dispatching
    # step_k (async), the next batch is fetched and rollout_{k+1} dispatched
    # on step_k's OUTPUT params (still futures) — the device then executes
    # step_k and rollout_{k+1} back-to-back with no host-induced gap, and
    # the ~28 ms/dispatch tunnel overhead disappears from the critical path.
    # RNG-split order, loader-fetch order and all numerics are identical to
    # the serial loop (test_rl_overlap_trajectory_parity); the prefetch is
    # issued only after the continuation verdict (eval early-stop, guard,
    # max_epochs/max_iterations) is known, so preemption snapshots record
    # exactly the serial loop's state. SURVEY §7 "score batch k while device
    # rolls out k+1" lands here as "device rolls out k+1 while the host
    # finishes iteration k's bookkeeping".
    overlap = bool(getattr(opt, "rl_overlap", 1))
    pending = None  # staged (data, fc, att, top_words, seq, greedy_seq)

    while True:
        trace.tick(iteration)
        if update_lr_flag:
            lr = lr_for_epoch(opt, epoch, rl_lr_base)
            opt.current_lr = lr
            update_lr_flag = False

        start = time.time()
        if pending is None:
            data, fc, att, top_words = fetch_batch()
            rng, roll_rng = jax.random.split(rng)
            seq, greedy_seq = rollout_fn(params, fc, att, roll_rng)
        else:
            data, fc, att, top_words, seq, greedy_seq = pending
            pending = None
        seq_np, greedy_np = _local_rows(seq), _local_rows(greedy_seq)

        rewards = compute_reward(
            cider_scorer, seq_np, greedy_np, data["gts"],
            use_baseline=bool(opt.use_baseline),
            cider_weight=opt.cider_weight,
            bleu4_weight=opt.bleu4_weight,
            spice_weight=opt.spice_weight,
            spice_fn=spice_fn,
        )
        if mesh is not None:
            from ..parallel.distributed import global_dp_batch

            # hand HOST rows to the global-array constructor: converting to
            # jnp first would round-trip device->host->device per iteration
            reward_dev = global_dp_batch(mesh, np.asarray(rewards, np.float32))
        else:
            reward_dev = jnp.asarray(rewards, jnp.float32)

        if opt.use_ppo:
            slp_old = old_logprobs_fn(params, fc, att, seq)
            slp_old = jax.lax.stop_gradient(slp_old)
            params, opt_state, loss = rl_step(
                params, opt_state, fc, att, seq, reward_dev, top_words, lr, slp_old
            )
            for _ in range(opt.ppo_k):
                params, opt_state, loss = rl_step(
                    params, opt_state, fc, att, seq, reward_dev, top_words, lr, slp_old
                )
        else:
            # without PPO the 'old' logprobs are unused by the criterion
            params, opt_state, loss = rl_step(
                params, opt_state, fc, att, seq, reward_dev, top_words, lr,
                jnp.zeros_like(reward_dev),
            )
        # loss stays a device future until after the next rollout is
        # dispatched (the deferred float(loss) below) — reading it here
        # would stall the host on step_k and re-serialize the pipeline

        if data["bounds"]["wrapped"]:
            epoch += 1
            update_lr_flag = True

        is_log = iteration % opt.losses_log_every == 0
        if is_log:
            # record the histories BEFORE any snapshot below can pickle
            # them (both values are host-side already — no device barrier);
            # the jlog entry needs train_loss and stays deferred
            loss_history[iteration] = float(np.mean(rewards[:, 0]))
            lr_history[iteration] = lr

        stop = False
        train_loss = elapsed = None
        is_eval = iteration % opt.save_checkpoint_every == 0 and iteration > 0
        if is_eval:
            # eval blocks on the device anyway — read the loss here so the
            # logged per-iteration seconds excludes the eval wall (serial
            # loop semantics); nothing overlappable is lost
            train_loss = float(loss)
            elapsed = time.time() - start
        if is_eval:
            val_loss, predictions, lang_stats = eval_split(
                model, params, loader, opt, split="val", rank=rank, mesh=mesh
            )
            val_result_history[iteration] = {
                "loss": val_loss, "lang_stats": lang_stats, "predictions": predictions,
            }
            current_score = (
                lang_stats["CIDEr"] if (opt.language_eval and lang_stats) else -val_loss
            )
            # host-agreed verdict — see train_loop: local per-host scores
            # would diverge best_flag and the collective save count
            from ..parallel.distributed import host_mean

            current_score = host_mean(current_score, len(predictions))
            best_flag = best_val_score is None or current_score > best_val_score
            if best_flag:
                best_val_score = current_score
                num_period_best = 1
            else:
                num_period_best += 1

            infos = snapshot_infos()
            if save_here:
                _ckpt.save_checkpoint(
                    opt.checkpoint_path, opt.id, rank,
                    params=params, opt_state=opt_state, infos=infos, best=False, prefix="rl_",
                )
            if best_flag:
                if save_here:
                    _ckpt.save_checkpoint(
                        opt.checkpoint_path, opt.id, rank,
                        params=params, opt_state=opt_state, infos=infos, best=True, prefix="rl_",
                    )
                log_fn(f"rl model saved (CIDEr {current_score:.3f})")
            # collective on multi-host (see train_loop's early stop)
            from ..parallel.distributed import all_hosts_agree

            if all_hosts_agree(num_period_best >= opt.num_eval_no_improve):
                log_fn("no improvement, exit")
                stop = True

        if not stop and guard.sync():
            # SIGTERM landed: save at this iteration boundary (post-step;
            # the snapshot records iteration+1 so resume replays nothing)
            # and exit cleanly inside the preemption grace window. No next
            # batch has been prefetched at this point, so the snapshot's
            # loader/RNG state is exactly the serial loop's.
            infos = snapshot_infos()
            if save_here:
                _ckpt.save_checkpoint(
                    opt.checkpoint_path, opt.id, rank,
                    params=params, opt_state=opt_state, infos=infos, best=False,
                    prefix="rl_",
                )
            log_fn(f"rank {rank}: preempted — rl checkpoint saved "
                   f"(resumes at iter {iteration + 1})")
            stop = True

        more = (
            not stop
            and not (opt.max_epochs != -1 and epoch >= opt.max_epochs)
            and not (max_iterations is not None and iteration + 1 >= max_iterations)
        )
        if overlap and more:
            # continuation is certain: stage iteration k+1's rollout behind
            # step_k on the device queue (params/opt_state are futures)
            ndata, nfc, natt, ntw = fetch_batch()
            rng, roll_rng = jax.random.split(rng)
            nseq, ngreedy = rollout_fn(params, nfc, natt, roll_rng)
            pending = (ndata, nfc, natt, ntw, nseq, ngreedy)

        if train_loss is None:
            train_loss = float(loss)  # barrier on step_k only; rollout_{k+1}
            elapsed = time.time() - start  # keeps running behind it

        if is_log:
            jlog.log(event="rl_train", iter=iteration, epoch=epoch,
                     avg_reward=float(np.mean(rewards[:, 0])),
                     loss=train_loss, lr=lr, seconds=elapsed)

        if not stop:
            log_fn(
                f"rank {rank}, iter {iteration}, (epoch {epoch}), avg_reward: "
                f"{float(np.mean(rewards[:, 0])):.3f}, train_loss: {train_loss:.4f}, "
                f"lr: {lr:.2e}, time: {elapsed:.3f}"
            )
        iteration += 1
        if stop or not more:
            break

    jlog.close()
    trace.close()
    guard.close()
    # async-checkpoint barrier (see train_loop)
    getattr(_ckpt, "wait_until_finished", lambda: None)()
    infos["iter"] = iteration
    infos["epoch"] = epoch
    infos["final_params"] = params
    infos["loss_history"] = loss_history
    return infos
