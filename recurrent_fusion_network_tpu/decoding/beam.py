"""Batched beam search.

A fixed-shape ``lax.scan`` + ``lax.top_k`` reformulation of the reference's
per-image Python beam loop (misc/RecurrentFusionModel.py:352-543), preserving
its idiosyncratic semantics:

  * token 0 is both BOS and EOS/padding;
  * at t == 1 only beam 0 is active (":469-470 rows = 1");
  * a beam whose previous token is 0 is dead and contributes no candidates
    (":475 dead-beam skip");
  * a beam is "done" when it emits 0 OR the length limit is reached (":508"),
    and done beams keep their accumulated log-prob;
  * the answer is the done beam with the highest accumulated log-prob, and the
    top-K done beams are also returned (":529-541").

Candidate selection parity: the reference enumerates the top-K tokens of each
live beam and keeps the global top-K by accumulated score; a global top-K over
all K·V candidates selects exactly the same set (any global top-K candidate is
within its own beam's top-K), so one `lax.top_k` over the flattened scores
suffices.

Instead of processing each image in a Python loop, all B images × K beams run
as one (B·K)-row batch through the decoder — beam lanes are grouped
image-major so the step function sees a flat batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG = -1e30


class BeamOut(NamedTuple):
    seq: jnp.ndarray  # (B, L) best done beam's tokens
    seq_logprobs: jnp.ndarray  # (B, L) its per-token log-probs
    top_seq: jnp.ndarray  # (B, K, L) top-K done beams
    top_p: jnp.ndarray  # (B, K) their accumulated log-probs


def _tile(tree, K):
    return jax.tree_util.tree_map(lambda x: jnp.repeat(x, K, axis=0), tree)


def _gather_lanes(tree, parent, B, K):
    """Reorder lane-major carry leaves (B*K, ...) by per-image parent (B, K)."""

    def g(x):
        xs = x.reshape((B, K) + x.shape[1:])
        idx = parent.reshape((B, K) + (1,) * (x.ndim - 1))
        xs = jnp.take_along_axis(xs, idx, axis=1)
        return xs.reshape((B * K,) + x.shape[1:])

    return jax.tree_util.tree_map(g, tree)


def beam_search(
    step_fn,
    init_carry,
    batch_size: int,
    beam_size: int,
    seq_length: int,
    vocab_width: int,
    *,
    tile_carry: bool = True,
):
    """Run beam search for a batch.

    Args:
      step_fn: (tokens (B*K,), carry) -> (logprobs (B*K, V+1), carry). Any
        memory closed over by step_fn must already be tiled to B*K rows
        (image-major) — use models.base.tile_for_lanes.
      init_carry: decoder state pytree; tiled here to B*K rows when
        tile_carry is True (pass False if already tiled).
    """
    B, K, L, V = batch_size, beam_size, seq_length, vocab_width
    assert K <= V, "beam_size must not exceed vocab width (reference assert)"
    carry0 = _tile(init_carry, K) if tile_carry else init_carry

    # t = 0: feed BOS on every lane.
    lp0, carry0 = step_fn(jnp.zeros((B * K,), jnp.int32), carry0)
    lp0 = lp0.reshape(B, K, V)

    lane_idx = jnp.arange(K)[None, :]  # (1, K)
    pos = jnp.arange(L)[None, None, :]  # (1, 1, L)

    def select(state, t):
        """One step of candidate selection + done-beam collection (no
        decoding): returns everything the next decode (or the epilogue)
        needs."""
        (carry, prev_lp, beam_seq, beam_lps, beam_sum, last_tok,
         done_seq, done_lps, done_p) = state

        scores = beam_sum[:, :, None] + prev_lp  # (B, K, V)
        dead = jnp.logical_and(t > 1, last_tok == 0)  # (B, K)
        scores = jnp.where(dead[:, :, None], NEG, scores)
        scores = jnp.where(
            jnp.logical_and(t == 1, lane_idx[:, :, None] > 0), NEG, scores
        )

        flat = scores.reshape(B, K * V)
        vals, idx = jax.lax.top_k(flat, K)  # (B, K) each, sorted desc
        parent = idx // V
        token = (idx % V).astype(jnp.int32)
        local_lp = jnp.take_along_axis(prev_lp.reshape(B, K * V), idx, axis=1)

        # fork beams: gather histories by parent, then write position t-1
        sel = lambda a: jnp.take_along_axis(a, parent[:, :, None], axis=1)
        at_t = pos == (t - 1)
        new_seq = jnp.where(at_t, token[:, :, None], sel(beam_seq))
        new_lps = jnp.where(at_t, local_lp[:, :, None], sel(beam_lps))

        # done-beam collection (emit EOS or length cutoff)
        done_now = jnp.logical_or(token == 0, t == L)
        cand_p = jnp.where(done_now, vals, NEG)
        merged_p = jnp.concatenate([done_p, cand_p], axis=1)  # (B, 2K)
        keep_p, keep_i = jax.lax.top_k(merged_p, K)
        merged_seq = jnp.concatenate([done_seq, new_seq], axis=1)  # (B, 2K, L)
        merged_lps = jnp.concatenate([done_lps, new_lps], axis=1)
        keep = lambda a: jnp.take_along_axis(a, keep_i[:, :, None], axis=1)
        return (parent, token, vals, new_seq, new_lps,
                keep(merged_seq), keep(merged_lps), keep_p)

    def body(state, t):
        (parent, token, vals, new_seq, new_lps,
         done_seq, done_lps, done_p) = select(state, t)
        # rearrange recurrent state to the forked beams and decode one step
        carry = _gather_lanes(state[0], parent, B, K)
        lp, carry = step_fn(token.reshape(B * K), carry)
        prev_lp = lp.reshape(B, K, V)
        return (
            carry, prev_lp, new_seq, new_lps, vals, token,
            done_seq, done_lps, done_p,
        ), None

    init = (
        carry0,
        lp0,
        jnp.zeros((B, K, L), jnp.int32),
        jnp.zeros((B, K, L)),
        jnp.zeros((B, K)),
        jnp.ones((B, K), jnp.int32),  # "no previous token" -> not dead at t=1
        jnp.zeros((B, K, L), jnp.int32),
        jnp.zeros((B, K, L)),
        jnp.full((B, K), NEG),
    )
    # scan decodes through step L-1; the final step (t == L) only selects and
    # collects — running it inside the scan would compute one full decoder
    # step over all B*K lanes whose outputs are discarded (~1/L of the
    # decode FLOPs)
    final, _ = jax.lax.scan(body, init, jnp.arange(1, L))
    *_, done_seq, done_lps, done_p = select(final, jnp.asarray(L))

    return BeamOut(
        seq=done_seq[:, 0, :],
        seq_logprobs=done_lps[:, 0, :],
        top_seq=done_seq,
        top_p=done_p,
    )
