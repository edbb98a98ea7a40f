"""Cross-entropy training driver.

Equivalent of the reference's main.py + train.py: resume from infos, epoch
LR decay and scheduled-sampling ramp, jitted forward+criterion+update per
iteration, periodic eval_split with best-by-CIDEr checkpointing, early stop
after `num_eval_no_improve` stagnant evals.

TPU-first: one jitted train_step (forward, loss, grads, elementwise clip,
optimizer direction, -lr update) reused across iterations; optional DP mesh —
batches sharded on 'dp', parameters replicated, XLA inserts the gradient
all-reduce (replacing the reference's Hogwild shared-memory path, which has
no TPU analogue).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import setup
from .checkpoint import backend as checkpoint_backend
from .criterion import make_criterion
from .eval_split import batch_feats, eval_split
from .optim import apply_updates, lr_for_epoch, make_optimizer, ss_prob_for_epoch


def make_train_step(model, crit, tx, mesh=None, compute_dtype=None):
    """Jitted XE train step: (params, opt_state, batch, lr, ss_prob, rng) ->
    (params, opt_state, loss).

    compute_dtype=jnp.bfloat16 enables the mixed-precision policy (--dtype
    bfloat16 for training): master params, gradients and optimizer moments
    stay f32, while the forward/backward matmuls run in bf16 (params cast
    inside the differentiated function; the cast's transpose accumulates
    gradients back into f32). Loss math stays f32 (the criterions cast
    log-probabilities up).
    """

    def step(params, opt_state, fc, att, labels, masks, top_words, lr, ss_prob, rng):
        def loss_fn(p):
            if compute_dtype is not None:
                from .eval_split import cast_tree

                p = cast_tree(p, compute_dtype)
            lps, reason = model.forward(
                p, fc, att, labels, ss_prob=ss_prob, rng=rng, deterministic=False
            )
            return crit(lps, labels, masks, reason, top_words)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        direction, opt_state = tx.update(grads, opt_state, params)
        params = apply_updates(params, direction, lr)
        return params, opt_state, loss

    # donate params + opt_state: at flagship scale (~490M params) the
    # in-place update halves the step's peak HBM vs double-buffering
    return jax.jit(step, donate_argnums=(0, 1))


def _device_batch(data, mesh=None, compute_dtype=None):
    multi = mesh is not None and jax.process_count() > 1
    lib = np if multi else jnp  # multi-host: stay host-side (see batch_feats)
    fc, att = batch_feats(data, compute_dtype, as_numpy=multi)
    labels = lib.asarray(data["labels"])
    masks = lib.asarray(data["masks"])
    top_words = lib.asarray(data["top_words"])
    if mesh is not None:
        from ..parallel.distributed import global_dp_batch

        # single-process: plain dp device_put; multi-process: this host's
        # local rows become its shard of the global batch arrays
        fc, att, labels, masks, top_words = global_dp_batch(
            mesh, (fc, att, labels, masks, top_words)
        )
    return fc, att, labels, masks, top_words


def train(
    opt,
    loader,
    *,
    rank: int = 0,
    max_iterations: Optional[int] = None,
    mesh=None,
    log_fn=print,
):
    """Run XE training. Returns the infos dict (histories, best score)."""
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length
    model = setup(opt)
    _ckpt = checkpoint_backend(opt)

    rng = jax.random.PRNGKey(opt.seed + rank)
    rng, init_rng = jax.random.split(rng)

    infos = {}
    saved_opt_state = None
    if opt.start_from is not None:
        params, saved_opt_state, infos = _ckpt.load_checkpoint(
            opt.start_from, opt.load_model_id, rank, best=False
        )
        from .checkpoint import assert_arch_matches

        assert_arch_matches(opt, infos.get("opt", {}))
        if "iterators" in infos:
            loader.restore_state(infos["iterators"], infos["split_image_id"],
                                 infos.get("loader_rng"))
        if "rng_key" in infos:
            # continue the dropout/scheduled-sampling RNG chain where the
            # saved run stopped instead of replaying it from the seed
            rng = jnp.asarray(infos["rng_key"])
    else:
        # only materialize the random init when it will actually be used
        # (the flagship model is 1.76 GB f32 — HBM discipline on resume)
        params = model.init_params(init_rng)

    iteration = infos.get("iter", 0)
    epoch = infos.get("epoch", 0)
    val_result_history = infos.get("val_result_history", {})
    loss_history = infos.get("loss_history", {})
    lr_history = infos.get("lr_history", {})
    ss_prob_history = infos.get("ss_prob_history", {})
    best_val_score = infos.get("best_val_score", None) if opt.load_best_score else None

    crit = make_criterion(opt)
    tx = make_optimizer(opt)
    if saved_opt_state is not None:
        # restore optimizer moments on resume (train.py:87-88 contract); the
        # adoption template is abstract so no throwaway zero moments are
        # allocated on device
        from .checkpoint import adopt_structure

        opt_state = adopt_structure(
            jax.eval_shape(tx.init, params), saved_opt_state
        )
    else:
        opt_state = tx.init(params)
    if mesh is not None:
        from ..parallel.mesh import (
            is_mesh_2d,
            replicate,
            shard_opt_state_2d,
            shard_params_2d,
        )

        if is_mesh_2d(mesh):
            # 2-D dp x mp: batch over 'dp', the vocab-dim projections
            # (logit/embed — the model's largest matmuls) over 'mp',
            # optimizer moments co-located with their weight shards;
            # GSPMD inserts the vocab-axis collectives (--num_mp_devices)
            sharded = shard_params_2d(mesh, params)
            opt_state = shard_opt_state_2d(mesh, opt_state, params, sharded)
            params = sharded
        else:
            params = replicate(mesh, params)
            opt_state = replicate(mesh, opt_state)

    from .eval_split import eval_dtype

    compute_dtype = eval_dtype(opt)  # --dtype bfloat16 -> mixed precision
    train_step = make_train_step(model, crit, tx, mesh, compute_dtype)

    from ..utils.logging import JsonlLogger
    from ..utils.profiling import TraceWindow

    jlog = JsonlLogger(getattr(opt, "json_log", "") or None)
    trace = TraceWindow.from_opt(opt)

    from .preempt import PreemptGuard

    guard = PreemptGuard.from_opt(opt)

    # stagnant-eval counter survives resume: a requeued run must not need
    # num_eval_no_improve FRESH stagnant evals to re-reach a stop it had
    # nearly (or already) earned before the preemption
    num_period_best = infos.get("num_period_best", 0)
    current_score = 0.0
    update_lr_flag = True
    lr = opt.optim_lr
    ss_prob = 0.0

    def snapshot_infos():
        # one infos builder for the periodic save and the preemption save.
        # Both run AFTER this iteration's step (loader cursor, RNG chain,
        # and params are post-step), so the recorded iter is iteration+1 —
        # the NEXT step to run. Recording the pre-increment value made a
        # resume re-enter an already-fired eval boundary: spurious eval,
        # num_period_best double-count, history overwrite, and labels off
        # by one vs the uninterrupted run. (The fleet loops snapshot after
        # their own `iteration += 1` — same convention.)
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
            "ss_prob_history": ss_prob_history,
            "num_period_best": num_period_best,  # early-stop progress
            "rng_key": np.asarray(rng),  # resume continues the RNG chain
            "vocab": loader.get_vocab(),
        }

    # multi-host write discipline: pickle saves are host-side writes of the
    # SAME path on every process (params replicated) — one writer, process
    # 0, avoids racing {path}.tmp on the shared filesystem. Orbax saves are
    # collective and MUST run on every process (checkpoint.backend note).
    save_here = getattr(_ckpt, "collective", False) or jax.process_index() == 0

    # Software pipeline (--xe_overlap, default on; the RL loop's twin, see
    # train_rl_loop): the XE iteration's only host work is fetch + dispatch
    # + loss readback, so reading the loss re-serializes the device on the
    # ~28 ms/dispatch tunnel round-trip every step. Instead, iteration k's
    # epilogue (after the continuation verdict: eval early-stop, guard,
    # max_epochs/max_iterations) fetches batch k+1 and dispatches
    # step_{k+1}; only then is loss_k read — a barrier on step_k alone,
    # with step_{k+1} already queued behind it. Fetch order, RNG-split
    # order and numerics are identical to the serial loop
    # (test_xe_overlap_trajectory_parity); preemption snapshots are taken
    # before any prefetch, so resume state matches serial exactly.
    overlap = bool(getattr(opt, "xe_overlap", 1))
    pending = None  # staged (data, loss-future) for the next iteration

    while True:
        trace.tick(iteration)
        if update_lr_flag:
            lr = lr_for_epoch(opt, epoch, opt.optim_lr)
            ss_prob = ss_prob_for_epoch(opt, epoch)
            opt.current_lr = lr
            opt.ss_prob = ss_prob
            update_lr_flag = False

        start = time.time()
        if pending is None:
            data = loader.get_batch("train")
            fc, att, labels, masks, top_words = _device_batch(
                data, mesh, compute_dtype)
            rng, step_rng = jax.random.split(rng)
            params, opt_state, loss = train_step(
                params, opt_state, fc, att, labels, masks, top_words, lr,
                ss_prob, step_rng
            )
        else:
            data, loss = pending  # step already dispatched in the epilogue
            pending = None

        if data["bounds"]["wrapped"]:
            epoch += 1
            update_lr_flag = True

        stop = False
        train_loss = elapsed = None
        is_eval = iteration % opt.save_checkpoint_every == 0 and iteration > 0
        is_log = iteration % opt.losses_log_every == 0
        if is_eval or is_log:
            # the loss value is needed now: at eval boundaries the device
            # blocks anyway; at log boundaries the history must be recorded
            # BEFORE any snapshot below pickles it (the overlap still hides
            # the readback on the (losses_log_every-1)/losses_log_every
            # non-logging iterations)
            train_loss = float(loss)
            elapsed = time.time() - start
        if is_log:
            loss_history[iteration] = train_loss
            lr_history[iteration] = lr
            ss_prob_history[iteration] = ss_prob
            jlog.log(event="train", iter=iteration, epoch=epoch,
                     loss=train_loss, lr=lr, ss_prob=ss_prob, seconds=elapsed)
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
            # host-AGREED verdict: on multi-host runs each process scored
            # only its local slice of the val stream, so the raw local
            # score would give hosts different best_flag values — and a
            # diverging number of collective orbax saves deadlocks the
            # barrier. Mean over equal disjoint host slices IS the global
            # score for per-image-mean metrics (host_mean docstring).
            from ..parallel.distributed import host_mean

            current_score = host_mean(current_score, len(predictions))
            jlog.log(event="val", iter=iteration, loss=val_loss,
                     **(lang_stats or {}))
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
                    params=params, opt_state=opt_state, infos=infos, best=False,
                )
            if best_flag:
                if save_here:
                    _ckpt.save_checkpoint(
                        opt.checkpoint_path, opt.id, rank,
                        params=params, opt_state=opt_state, infos=infos, best=True,
                    )
                log_fn(f"model saved to {opt.checkpoint_path} (CIDEr {current_score:.3f})")
            # collective on multi-host: per-host scores (host-local eval)
            # diverge, and a host breaking alone would strand its peers in
            # the next collective step / guard.sync() allgather
            from ..parallel.distributed import all_hosts_agree

            if all_hosts_agree(num_period_best >= opt.num_eval_no_improve):
                log_fn("no improvement, exit")
                stop = True

        if not stop and guard.sync():
            # SIGTERM landed: save at this iteration boundary (post-step —
            # the snapshot records iteration+1 as the next step to run, so
            # resume replays nothing) and exit cleanly inside the
            # preemption grace window. No next batch has been prefetched
            # here, so the snapshot state is exactly the serial loop's.
            infos = snapshot_infos()
            if save_here:
                _ckpt.save_checkpoint(
                    opt.checkpoint_path, opt.id, rank,
                    params=params, opt_state=opt_state, infos=infos, best=False,
                )
            log_fn(f"rank {rank}: preempted — checkpoint saved "
                   f"(resumes at iter {iteration + 1})")
            stop = True

        # iteration k's own lr, for its console line — the epilogue below
        # may already advance lr for k+1 when batch_k wrapped
        lr_k = lr
        more = (
            not stop
            and not (opt.max_epochs != -1 and epoch >= opt.max_epochs)
            and not (max_iterations is not None and iteration + 1 >= max_iterations)
        )
        if overlap and more:
            # continuation is certain: stage iteration k+1's step behind
            # step_k on the device queue (params/opt_state are futures).
            # lr/ss_prob for k+1 are recomputed here when batch_k wrapped
            # (idempotent with the top-of-loop block).
            if update_lr_flag:
                lr = lr_for_epoch(opt, epoch, opt.optim_lr)
                ss_prob = ss_prob_for_epoch(opt, epoch)
                opt.current_lr = lr
                opt.ss_prob = ss_prob
                update_lr_flag = False
            ndata = loader.get_batch("train")
            nfc, natt, nlabels, nmasks, ntw = _device_batch(
                ndata, mesh, compute_dtype)
            rng, step_rng = jax.random.split(rng)
            params, opt_state, nloss = train_step(
                params, opt_state, nfc, natt, nlabels, nmasks, ntw, lr,
                ss_prob, step_rng
            )
            pending = (ndata, nloss)

        if train_loss is None:
            train_loss = float(loss)  # barrier on step_k only; step_{k+1}
            elapsed = time.time() - start  # is already queued behind it

        if not stop:
            log_fn(
                f"rank {rank}, iter {iteration}, (epoch {epoch}), train loss: "
                f"{train_loss:.4f}, lr: {lr_k:.2e}, current cider: {current_score:.3f}, "
                f"time: {elapsed:.3f}"
            )
        iteration += 1
        if stop or not more:
            break

    jlog.close()
    trace.close()
    guard.close()
    # async-checkpoint barrier: in-flight background writes must land before
    # the process can exit (interpreter shutdown cannot complete them)
    getattr(_ckpt, "wait_until_finished", lambda: None)()
    infos["iter"] = iteration
    infos["epoch"] = epoch
    infos["final_params"] = params
    infos["loss_history"] = loss_history
    return infos
