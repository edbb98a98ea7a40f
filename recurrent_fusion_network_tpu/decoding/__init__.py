"""Decoding engines: batched greedy/temperature sampling, batched beam
search, and multi-checkpoint ensemble decoding.

These replace the reference's per-image Python loops
(misc/RecurrentFusionModel.py:352-543 sample_beam, :545-658 sample;
eval_utils.py:268-383 ensemble one-step helpers) with fixed-shape
``lax.scan`` + ``lax.top_k`` formulations that keep every image and beam lane
on the MXU simultaneously.

All engines are generic over a ``step_fn(tokens, carry) -> (logprobs, carry)``
closure built by ``make_step_fn`` (single model) or ``make_ensemble_step_fn``
(per-step mean of model logits, the reference's ensemble rule at
eval_utils.py:282-289).
"""

from .api import ModelSampleOut, model_sample  # noqa: F401
from .beam import BeamOut, beam_search  # noqa: F401
from .engine import make_ensemble_step_fn, make_step_fn  # noqa: F401
from .sample import SampleOut, sample  # noqa: F401
