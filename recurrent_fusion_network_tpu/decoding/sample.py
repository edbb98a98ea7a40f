"""Batched greedy / temperature sampling.

One ``lax.scan`` over time for the whole batch, replacing the reference's
per-step Python loop with early break (misc/RecurrentFusionModel.py:616-653).
Semantics match the reference exactly:

  * t = 0 feeds BOS (token 0); sampling starts from the step-1 distribution.
  * greedy (`sample_max`) takes argmax; otherwise a multinomial draw from
    exp(logprobs / temperature), with the recorded log-prob taken from the
    UN-tempered distribution (misc/RecurrentFusionModel.py:624-635).
  * `unfinished` latches to 0 once a sample emits token 0; recorded tokens are
    masked to 0 afterwards, but the embedding input uses the raw sampled token
    (the reference embeds before masking, :637-647).
  * the early `break` when all samples finish is a compute shortcut only —
    here the scan always runs seq_length+1 steps and the masks make the
    remainder inert.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SampleOut(NamedTuple):
    seq: jnp.ndarray  # (B, L) int32, 0 after EOS
    seq_logprobs: jnp.ndarray  # (B, L) log-prob of each sampled token
    logprobs_all: jnp.ndarray  # (B, L+1, V+1) per-step log-distributions


def sample(
    step_fn,
    init_carry,
    batch_size: int,
    seq_length: int,
    vocab_width: int,
    *,
    sample_max: bool = True,
    temperature: float = 1.0,
    rng=None,
    greedy_mask=None,
):
    """Roll out seq_length tokens for a batch.

    Args:
      step_fn: (tokens (B,), carry) -> (logprobs (B, V+1), carry).
      init_carry: decoder state pytree after `encode`.
      vocab_width: V+1, the log-distribution width produced by step_fn.
      sample_max: greedy argmax if True, multinomial otherwise.
      rng: required when sample_max is False.
      greedy_mask: optional (B,) bool — rows where True decode greedily, the
        rest multinomially, in ONE scan. This is the fused SCST rollout: the
        sampled rollout and its greedy baseline share the per-step decode
        (train_rl_loop.make_rollout_fn stacks the two lanes). Overrides
        sample_max per row; greedy rows match a pure sample_max run exactly
        (argmax is draw-independent).
    """
    B, L = batch_size, seq_length
    if rng is None:
        # deterministic fallback for greedy-only use; multinomial callers
        # must thread a key (eval_split folds one per batch) or every
        # batch re-draws the identical PRNGKey(0) noise
        rng = jax.random.PRNGKey(0)

    def body(carry, t):
        state, prev_lp, unfinished, rng = carry
        rng, r = jax.random.split(rng)
        if greedy_mask is not None:
            drawn = jax.random.categorical(
                r, prev_lp / temperature, axis=-1
            ).astype(jnp.int32)
            it_raw = jnp.where(
                greedy_mask, jnp.argmax(prev_lp, axis=-1).astype(jnp.int32), drawn
            )
        elif sample_max:
            it_raw = jnp.argmax(prev_lp, axis=-1).astype(jnp.int32)
        else:
            it_raw = jax.random.categorical(r, prev_lp / temperature, axis=-1).astype(
                jnp.int32
            )
        samp_lp = jnp.take_along_axis(prev_lp, it_raw[:, None], axis=1)[:, 0]
        it_raw = jnp.where(t == 0, jnp.zeros_like(it_raw), it_raw)  # BOS at t=0
        new_unfinished = jnp.where(
            t <= 1, it_raw > 0, jnp.logical_and(unfinished, it_raw > 0)
        )
        it_masked = it_raw * new_unfinished.astype(it_raw.dtype)
        lp, state = step_fn(it_raw, state)
        # the reference breaks out once EVERY row finished, so its padded
        # outputs have a zero tail (per-row phantom draws while OTHER rows
        # continue ARE recorded — parity); a fixed-shape scan must mask that
        # batch-finished tail explicitly. One deliberate deviation: the
        # reference's break fires BEFORE appending the step where the LAST
        # row emits EOS (misc/RecurrentFusionModel.py:645-650), dropping
        # that row's EOS logprob from seqLogprobs while keeping every
        # earlier-finishing row's; we record it so all rows' EOS draws are
        # treated uniformly (the RL mask counts that position either way).
        alive = jnp.logical_or(t <= 1, jnp.any(unfinished))
        rec = jnp.logical_and(t >= 1, alive)
        out = (
            jnp.where(rec, it_masked, 0),
            jnp.where(rec, samp_lp, 0.0),
            lp,
        )
        return (state, lp, new_unfinished, rng), out

    init = (init_carry, jnp.zeros((B, vocab_width)), jnp.zeros((B,), bool), rng)
    _, (toks, lps, all_lps) = jax.lax.scan(body, init, jnp.arange(L + 1))

    # scan stacks (L+1, ...); recorded tokens start at t=1 -> drop index 0
    seq = jnp.transpose(toks[1:], (1, 0))  # (B, L)
    seq_lp = jnp.transpose(lps[1:], (1, 0))  # (B, L)
    logprobs_all = jnp.transpose(all_lps, (1, 0, 2))  # (B, L+1, V+1)
    return SampleOut(seq=seq, seq_logprobs=seq_lp, logprobs_all=logprobs_all)
