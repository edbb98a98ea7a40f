"""Model-level decode API mirroring the reference's ``model.sample`` surface
(misc/RecurrentFusionModel.py:545-551): greedy / multinomial when
``beam_size == 1``, beam search otherwise.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..models.base import tile_for_lanes
from .beam import BeamOut, beam_search
from .engine import make_step_fn
from .sample import SampleOut, sample


class ModelSampleOut(NamedTuple):
    seq: jnp.ndarray  # (B, L)
    seq_logprobs: jnp.ndarray  # (B, L)
    logprobs_all: Optional[jnp.ndarray]  # (B, L+1, V+1), sampling path only
    top_seq: Optional[jnp.ndarray]  # (B, K, L), beam path only
    top_p: Optional[jnp.ndarray]  # (B, K), beam path only
    reason_preds: list


def model_sample(
    model,
    params,
    fc_feats,
    att_feats,
    *,
    beam_size: int = 1,
    sample_max: bool = True,
    temperature: float = 1.0,
    rng=None,
):
    """Encode then decode a batch with the requested strategy."""
    enc = model.encode(params, fc_feats, att_feats)
    fc0 = fc_feats[0] if isinstance(fc_feats, (list, tuple)) else fc_feats
    B = fc0.shape[0]
    V1 = model.vocab_size + 1
    if beam_size > 1:
        memory = tile_for_lanes(enc.memory, beam_size)
        step = make_step_fn(model, params, memory)
        out: BeamOut = beam_search(
            step, enc.state, B, beam_size, model.seq_length, V1
        )
        return ModelSampleOut(
            seq=out.seq,
            seq_logprobs=out.seq_logprobs,
            logprobs_all=None,
            top_seq=out.top_seq,
            top_p=out.top_p,
            reason_preds=enc.reason_preds,
        )
    step = make_step_fn(model, params, enc.memory)
    out: SampleOut = sample(
        step,
        enc.state,
        B,
        model.seq_length,
        V1,
        sample_max=sample_max,
        temperature=temperature,
        rng=rng,
    )
    return ModelSampleOut(
        seq=out.seq,
        seq_logprobs=out.seq_logprobs,
        logprobs_all=out.logprobs_all,
        top_seq=None,
        top_p=None,
        reason_preds=enc.reason_preds,
    )
