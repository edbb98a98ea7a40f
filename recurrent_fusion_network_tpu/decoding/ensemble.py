"""Multi-checkpoint ensemble decoding.

Equivalent of the reference's ensemble eval paths (eval_utils.py:268-383 +
:387-1493): every member model encodes once, then each decode step averages
the members' logits and log-softmaxes the mean. Members may share features
(multi-seed RFNet ensembles, eval_ensemble.py:30-37) or each consume a
different encoder's features (the review_net 'diff_feat' ensembles,
eval_utils.py:1026-1493).

The reference places members on different GPUs and funnels logits to GPU0
per step (eval_utils.py:293-317); here all members run in one jitted program
on one chip — the XLA scheduler interleaves them — and the beam variant runs
batched instead of per image. The flip ensemble (eval_ensemble.py:162-187)
decodes with original and flipped features and keeps, per image, the sentence
with the higher accumulated log-prob.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import tile_for_lanes
from .beam import beam_search
from .engine import make_ensemble_step_fn
from .sample import sample


class EnsembleOut(NamedTuple):
    seq: jnp.ndarray
    seq_logprobs: jnp.ndarray
    top_seq: Optional[jnp.ndarray]
    top_p: Optional[jnp.ndarray]


def ensemble_sample(
    models: Sequence,  # static model configs (one per member)
    params_list: Sequence,  # per-member parameter pytrees (traced)
    feats_list: Sequence[Tuple],  # per-member (fc, att)
    *,
    beam_size: int = 1,
    sample_max: bool = True,
    temperature: float = 1.0,
    rng=None,
) -> EnsembleOut:
    """`models` must stay a Python-level constant under jit (close over it);
    `params_list` / `feats_list` are traced arguments so the member weights
    are NOT baked into the compiled program as literals."""
    assert len(models) == len(params_list) == len(feats_list)
    members = list(zip(models, params_list))
    encs = [
        model.encode(params, fc, att)
        for (model, params), (fc, att) in zip(members, feats_list)
    ]
    model0 = models[0]
    fc0 = feats_list[0][0]
    fc0 = fc0[0] if isinstance(fc0, (list, tuple)) else fc0
    B = fc0.shape[0]
    V1 = model0.vocab_size + 1
    L = model0.seq_length

    if beam_size > 1:
        triples = [
            (model, params, tile_for_lanes(enc.memory, beam_size))
            for (model, params), enc in zip(members, encs)
        ]
        step = make_ensemble_step_fn(triples)
        states = tuple(tile_for_lanes(enc.state, beam_size) for enc in encs)
        out = beam_search(step, states, B, beam_size, L, V1, tile_carry=False)
        return EnsembleOut(out.seq, out.seq_logprobs, out.top_seq, out.top_p)

    triples = [
        (model, params, enc.memory) for (model, params), enc in zip(members, encs)
    ]
    step = make_ensemble_step_fn(triples)
    states = tuple(enc.state for enc in encs)
    out = sample(
        step, states, B, L, V1,
        sample_max=sample_max, temperature=temperature, rng=rng,
    )
    return EnsembleOut(out.seq, out.seq_logprobs, None, None)


def sentence_logprob(seq, seq_logprobs):
    """sum(seq_logprobs * (seq > 0)) — the reference's sentence log-prob
    (eval_utils.py:690,947, feeding the flip combiner at
    eval_ensemble.py:175-182): the mask aligns WITH the sequence, so the
    EOS step and everything after are excluded. (Deliberately NOT the
    SCST shifted mask, which always counts position 0 and the EOS step —
    that convention belongs to the reward loss, not this comparison.)"""
    seq = np.asarray(seq)
    lps = np.asarray(seq_logprobs)
    return (lps * (seq > 0)).sum(axis=1)


def flip_combine(out_a: EnsembleOut, out_b: EnsembleOut) -> Tuple[np.ndarray, np.ndarray]:
    """Per-image pick of the higher-log-prob sentence between two decodes
    (eval_ensemble.py:162-187). Returns (seq, chosen_logprob).

    Both branches compare the reference's masked per-token sum — the beam
    path previously compared accumulated beam scores (top_p), which
    include the EOS log-prob and put length-cutoff beams on inconsistent
    footing. Tie-break matches the reference's `if prob_1 > prob_2`:
    the FLIPPED decode wins exact ties."""
    p_a = sentence_logprob(out_a.seq, out_a.seq_logprobs)
    p_b = sentence_logprob(out_b.seq, out_b.seq_logprobs)
    pick_a = p_a > p_b
    seq = np.where(pick_a[:, None], np.asarray(out_a.seq), np.asarray(out_b.seq))
    return seq, np.where(pick_a, p_a, p_b)
