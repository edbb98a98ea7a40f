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
    """Accumulated log-prob of each sentence: tokens + the EOS step
    (the SCST mask convention, also used by the flip combiner)."""
    seq = np.asarray(seq)
    lps = np.asarray(seq_logprobs)
    mask0 = (seq > 0).astype(np.float64)
    mask = np.concatenate([np.ones_like(mask0[:, :1]), mask0[:, :-1]], axis=1)
    return (lps * mask).sum(axis=1)


def flip_combine(out_a: EnsembleOut, out_b: EnsembleOut) -> Tuple[np.ndarray, np.ndarray]:
    """Per-image pick of the higher-log-prob sentence between two decodes
    (eval_ensemble.py:162-187). Returns (seq, chosen_logprob)."""
    if out_a.top_p is not None:
        p_a = np.asarray(out_a.top_p[:, 0])
        p_b = np.asarray(out_b.top_p[:, 0])
    else:
        p_a = sentence_logprob(out_a.seq, out_a.seq_logprobs)
        p_b = sentence_logprob(out_b.seq, out_b.seq_logprobs)
    pick_a = p_a >= p_b
    seq = np.where(pick_a[:, None], np.asarray(out_a.seq), np.asarray(out_b.seq))
    return seq, np.where(pick_a, p_a, p_b)
