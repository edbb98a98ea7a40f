"""Shared model protocol pieces + the model factory.

The factory mirrors the reference's ``models.setup(opt)`` dispatch
(models.py:14-38): name -> model class, with optional checkpoint restore
handled by ``training/checkpoint.py`` at the call site.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.initializers import linear, uniform


class EncodeOut(NamedTuple):
    """Result of running a model's image-conditioning phase.

    memory:       whatever the decoder attends over (None for ShowTell,
                  dict with thought vectors + precomputed attention keys for
                  ReviewNet / RFNet).
    state:        initial decoder recurrent state (pytree; every leaf has
                  batch on axis 0).
    reason_preds: list of (B, top_words) discriminative head outputs
                  ([] for ShowTell, [pred] for ReviewNet, M+1 for RFNet).
    """

    memory: Any
    state: Any
    reason_preds: List[jnp.ndarray]


def init_embed_logit(key, vocab_size: int, input_encoding_size: int, rnn_size: int):
    """Token embedding (V+1, E) with U(-0.1, 0.1) and output projection
    (R -> V+1) with uniform weight / zero bias — the shared init of every
    reference model (e.g. misc/ShowTellModel.py:32-36)."""
    k_e, k_l = jax.random.split(key)
    embed = uniform(k_e, (vocab_size + 1, input_encoding_size))
    logit = linear(k_l, rnn_size, vocab_size + 1, bias=0.0)
    return embed, logit


def _resolve_tied(opt) -> bool:
    """Resolve opt.tied_att_keys including the -1 'auto' sentinel.

    bool(-1) is True, so a bare coercion silently built the TIED variant
    for any opt that never went through config.finalize_options
    (programmatic use, tests constructing Options directly, old checkpoint
    opt dicts) — replicate the CLI profile resolution instead: auto means
    tied unless --reference_parity."""
    tied = getattr(opt, "tied_att_keys", 0)
    if tied == -1:
        return not bool(getattr(opt, "reference_parity", 0))
    return bool(tied)


def embed_tokens(params, tokens):
    return jnp.take(params["embed"], tokens, axis=0)


def remat_wrap(fn, policy: str = "save_ctx"):
    """jax.checkpoint with the model's remat policy.

    "full":     rematerialize everything (carries only are stored) — the
                round-2 behavior.
    "save_ctx": rematerialize everything EXCEPT the per-step attention
                contexts/weights tagged ``checkpoint_name`` in
                ops/attention.py. Those are (B, D)/(B, A) — tiny next to the
                (B, A, D) feature arrays their recomputation would have to
                re-read from HBM (at flagship dims ~1.6 GB per review step),
                so this trades ~150 MB of saved activations for skipping a
                third full pass over the feature arrays in the backward.
                Bitwise-identical outputs (the saved values ARE the forward's
                values); only the backward's memory traffic changes.
    """
    if policy == "save_ctx":
        pol = jax.checkpoint_policies.save_only_these_names(
            "attn_ctx", "attn_weights"
        )
        return jax.checkpoint(fn, policy=pol)
    if policy != "full":
        # a typo ('save-ctx') must not silently degrade to save-nothing
        # remat — the backward's memory-traffic behavior changes with no
        # other symptom (advisor r4)
        raise ValueError(
            f"unknown remat policy {policy!r} (expected 'save_ctx' or 'full')"
        )
    return jax.checkpoint(fn)


def tile_for_lanes(tree, n_lanes: int):
    """Repeat every leaf along batch axis 0: (B, ...) -> (B*n_lanes, ...),
    image-major (each image's block of lanes is contiguous)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, n_lanes, axis=0) if x is not None else None, tree
    )


def xe_decode(
    decode_logprobs_fn,
    embed_fn,
    state,
    seq_in,
    *,
    ss_prob=0.0,
    rng=None,
    vocab_size: int,
    remat: bool = False,
    remat_policy: str = "save_ctx",
):
    """Teacher-forced decode over time with scheduled sampling.

    Replicates the reference training decode loop
    (misc/RecurrentFusionModel.py:258-281): at step t >= 1, each sample's
    input token is replaced, with probability ss_prob, by a draw from the
    previous step's predicted distribution. Implemented as one `lax.scan`
    over the time axis with fixed shapes (the reference's early `break` when
    all sequences end is a compute shortcut, not a semantic difference — the
    masked loss ignores the extra steps).

    Args:
      decode_logprobs_fn: (xt, state, rng) -> (logprobs, state).
      embed_fn: tokens -> embeddings.
      seq_in: (B, T) int input tokens (column 0 is BOS = 0).

    Returns:
      (B, T, V+1) log-probabilities.
    """
    B, T = seq_in.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)
    ss = jnp.asarray(ss_prob, jnp.float32)

    def step(carry, inp):
        state, prev_lp, rng = carry
        tok, t_idx = inp
        rng, r_coin, r_samp, r_drop = jax.random.split(rng, 4)

        def with_ss(_):
            coin = jax.random.uniform(r_coin, (B,)) < ss
            sampled = jax.random.categorical(r_samp, prev_lp, axis=-1)
            use_ss = jnp.logical_and(t_idx >= 1, coin)
            return jnp.where(use_ss, sampled, tok)

        # lax.cond: before the scheduled-sampling ramp starts (ss == 0 — all
        # of XE training under the reference default scheduled_sampling_start
        # = -1) the per-step (B, V) gumbel draw + categorical never executes.
        # Identical tokens either way (at ss == 0 the old path drew the coin
        # and discarded it), and the RNG chain is split unconditionally so
        # trajectories are bitwise-unchanged across the ramp boundary.
        it = jax.lax.cond(ss > 0.0, with_ss, lambda _: tok, None)
        xt = embed_fn(it)
        lp, state = decode_logprobs_fn(xt, state, r_drop)
        return (state, lp, rng), lp

    if remat:
        # recompute each step's activations in the backward pass (saves the
        # per-step attention/gate intermediates; carries alone are stored —
        # plus the policy-named attention values, see remat_wrap)
        step = remat_wrap(step, remat_policy)
    init_lp = jnp.zeros((B, vocab_size + 1))
    xs = (seq_in.T, jnp.arange(T))
    (_, _, _), lps = jax.lax.scan(step, (state, init_lp, rng), xs)
    return jnp.transpose(lps, (1, 0, 2))


def setup(opt):
    """Model factory (reference: models.py:14-38)."""
    from .recurrent_fusion import RecurrentFusionModel
    from .review_net import ReviewNetModel
    from .show_tell import ShowTellModel

    if opt.caption_model == "show_tell":
        return ShowTellModel.from_opt(opt)
    if opt.caption_model == "review_net":
        return ReviewNetModel.from_opt(opt)
    if opt.caption_model == "recurrent_fusion_model":
        return RecurrentFusionModel.from_opt(opt)
    raise ValueError(f"Caption model not supported: {opt.caption_model}")
