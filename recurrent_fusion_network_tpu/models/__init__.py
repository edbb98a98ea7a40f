"""Caption models: ShowTell, ReviewNet, RecurrentFusionModel + factory.

Each model is a thin class of static config whose methods are pure functions
of an explicit parameter pytree. The shared protocol (see ``base.py``):

  init_params(rng)                          -> params
  embed(params, tokens)                     -> (B, E) token embeddings
  encode(params, fc, att, ...)              -> EncodeOut(memory, state, reason_preds)
  decode_logits(params, xt, memory, state)  -> (logits, state)   # ensemble hook
  decode_logprobs(params, xt, memory, state)-> (logprobs, state)
  forward(params, fc, att, seq, ...)        -> (logprobs, reason_preds)  # XE

``encode`` subsumes the reference's get_init_state + get_thought_vectors
(misc/RecurrentFusionModel.py:283-343); ``decode_logits`` is the reference's
one_time_step (misc/RecurrentFusionModel.py:345-350). Greedy / beam / ensemble
decoding are generic engines in ``decoding/`` driven by these hooks.
"""

from .base import EncodeOut, setup  # noqa: F401
from .recurrent_fusion import RecurrentFusionModel  # noqa: F401
from .review_net import ReviewNetModel  # noqa: F401
from .show_tell import ShowTellModel  # noqa: F401
