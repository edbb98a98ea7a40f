"""Step-function builders shared by all decode engines.

A step function has signature ``step_fn(tokens, carry) -> (logprobs, carry)``
where ``tokens`` is (N,) int32 and ``logprobs`` is (N, V+1) normalized
log-probabilities. ``carry`` is an arbitrary pytree whose leaves all have the
batch/lane dimension on axis 0 (required by the beam engine's lane gather).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp


def make_step_fn(model, params, memory):
    """Single-model eval-mode step function."""

    def step_fn(tokens, state):
        xt = model.embed(params, tokens)
        return model.decode_logprobs(params, xt, memory, state)

    return step_fn


def make_ensemble_step_fn(members: Sequence[Tuple[Any, Any, Any]]):
    """Ensemble step: mean of per-model logits, then log-softmax
    (reference: eval_utils.py:282-289 model_ensemble_feat_array_one_step).

    members: sequence of (model, params, memory) triples. The carry is a tuple
    of per-model states. For MoS models the 'logit' is the mixture probability
    (matching the reference's one_time_step contract).

    Reference QUIRK preserved deliberately: the reference ensembles MoS
    members by log_softmax(mean(mixture PROBABILITIES)) — one_time_step
    returns self.mos(output) (probabilities in [0,1],
    misc/ReviewNetModel.py:156-165) and model_ensemble_*_one_step applies
    log_softmax to their mean (eval_utils.py:282-289). That compresses
    per-step scores into a ~1-nat range (a single-member MoS "ensemble"
    does not reduce to the solo decode's log(p)), and mixing MoS with
    non-MoS members averages [0,1] probabilities against raw logits. We
    reproduce it exactly for output parity; MoS is ReviewNet-only and
    off by default, and the flagship RFNet ensembles are unaffected.
    """

    def step_fn(tokens, states):
        logits = []
        new_states = []
        for (model, params, memory), state in zip(members, states):
            xt = model.embed(params, tokens)
            l, state = model.decode_logits(params, xt, memory, state)
            logits.append(l)
            new_states.append(state)
        mean = sum(l.astype(jnp.float32) for l in logits) / len(logits)
        return jax.nn.log_softmax(mean, axis=-1), tuple(new_states)

    return step_fn
