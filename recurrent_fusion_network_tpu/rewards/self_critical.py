"""Self-critical (SCST) reward assembly.

Equivalent of the reference's get_rewards.py: score the sampled rollout and a
greedy rollout with CIDEr-D (optionally + BLEU-4), subtract the greedy
baseline, combine with weights, and broadcast the per-sentence reward over
timesteps (get_rewards.py:39-112).

SPICE (an external Java HTTP service in the reference, spiceD.py:30-114) is
supported through an optional callable hook called as
``spice_fn(hyps, refs_per_hyp) -> per-hyp scores`` — hypotheses FIRST, one
reference list per hypothesis row (NOT the reference jar's (gts, res)
argument order; metrics/spice.py's adapters implement this contract). The
default reward is CIDEr-only like the reference's defaults (opts.py:193-198).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from ..metrics.bleu import BleuScorer
from .cider_d import CiderD, trim_with_eos


def compute_reward(
    cider_scorer: CiderD,
    gen_result: np.ndarray,
    greedy_res: np.ndarray,
    gts: Sequence[np.ndarray],
    *,
    use_baseline: bool = True,
    cider_weight: float = 1.0,
    bleu4_weight: float = 0.0,
    spice_weight: float = 0.0,
    spice_fn: Optional[Callable] = None,
    verbose: bool = False,
):
    """Per-timestep rewards (B, T) for the sampled rollout.

    gen_result / greedy_res: (B, T) int arrays (0 after EOS).
    gts: per-IMAGE full caption sets; B must be a multiple of len(gts)
    (seq_per_img expansion, get_rewards.py:41).
    """
    gen_result = np.asarray(gen_result)
    greedy_res = np.asarray(greedy_res)
    B, T = gen_result.shape
    n_img = len(gts)
    seq_per_img = B // n_img
    assert B % n_img == 0

    hyps = [gen_result[i] for i in range(B)] + [greedy_res[i] for i in range(B)]
    img_of = [(i % B) // seq_per_img for i in range(2 * B)]
    refs = [gts[j] for j in img_of]

    cider_scores = cider_scorer.score_arrays(hyps, refs, ref_cache_keys=img_of)

    if bleu4_weight > 0:
        scorer = BleuScorer(4)
        # tokenize each IMAGE's reference set once (2B rows share n_img
        # sets — rebuilding per row cost ~2*seq_per_img redundant passes
        # per image on this CPU hot path; same dedup the CIDEr path gets
        # from ref_cache_keys)
        ref_toks = [
            [[str(t) for t in trim_with_eos(r)] for r in g] for g in gts
        ]
        for h, j in zip(hyps, img_of):
            scorer.append([str(t) for t in trim_with_eos(h)], ref_toks[j])
        _, per_sent = scorer.compute()
        bleu4 = np.array([s[3] for s in per_sent])
    else:
        bleu4 = np.zeros_like(cider_scores)

    if spice_weight > 0 and spice_fn is not None:
        spice = np.asarray(spice_fn(hyps, refs))
    else:
        spice = np.zeros_like(cider_scores)

    if verbose:
        print(f"Cider: {cider_scores[:B].mean():.3f} (greedy {cider_scores[B:].mean():.3f})")

    if use_baseline:
        cider_scores = cider_scores[:B] - cider_scores[B:]
        bleu4 = bleu4[:B] - bleu4[B:]
        spice = spice[:B] - spice[B:]
    else:
        cider_scores, bleu4, spice = cider_scores[:B], bleu4[:B], spice[:B]

    combined = (
        cider_weight * cider_scores + bleu4_weight * bleu4 + spice_weight * spice
    )
    return np.repeat(combined[:, None], T, axis=1)


def get_self_critical_reward(
    model,
    params,
    fc_feats,
    att_feats,
    gts,
    gen_result,
    cider_scorer: CiderD,
    *,
    greedy_sample_fn=None,
    **reward_kwargs,
):
    """Run the greedy baseline rollout and compute rewards
    (get_rewards.py:115-140). greedy_sample_fn overrides the rollout (e.g. a
    pre-jitted closure); defaults to decoding.model_sample greedy."""
    if greedy_sample_fn is None:
        from ..decoding.api import model_sample

        def greedy_sample_fn(params, fc, att):
            return model_sample(model, params, fc, att, beam_size=1, sample_max=True).seq

    greedy_res = np.asarray(greedy_sample_fn(params, fc_feats, att_feats))
    return compute_reward(
        cider_scorer, np.asarray(gen_result), greedy_res, gts, **reward_kwargs
    )
