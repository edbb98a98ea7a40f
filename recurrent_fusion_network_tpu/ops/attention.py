"""Additive (Bahdanau / show-attend-tell) soft attention.

Functional equivalent of the reference's ``AttentionModelCore``
(misc/AttentionModelCore.py:31-48): score = v . tanh(Wa att + Wh h),
softmax over spatial positions, context = weighted sum of features.

TPU-first differences from the reference:
  * The feature projection ``Wa att`` is h-independent; it is exposed as
    ``precompute_keys`` and computed ONCE per sequence instead of at every
    timestep (the reference recomputes it every step).
  * Variable-length spatial axes are handled by an optional boolean mask so
    heterogeneous encoders can be padded to a common static shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .initializers import apply_linear, linear

NEG_INF = -1e9


def init(key, rnn_size: int, att_feat_size: int, att_hid_size: int, *, bias="uniform"):
    """Params for one attention head.

    bias="uniform" matches AttentionModelCore / LSTMSoftAttentionCore init
    (misc/AttentionModelCore.py:21-29); bias=0.0 matches the
    LSTMSoftAttentionNoInputCore variant (misc/LSTMSoftAttentionNoInputCore.py:44-51).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "att_2_att_h": linear(k1, att_feat_size, att_hid_size, bias=bias),
        "h_2_att_h": linear(k2, rnn_size, att_hid_size, bias=bias),
        "att_h_2_out": linear(k3, att_hid_size, 1, bias=bias),
    }


def precompute_keys(params, att_feats):
    """Project spatial features once: (B, A, D) -> (B, A, H)."""
    return apply_linear(params["att_2_att_h"], att_feats)


def attend(params, h, att_feats, keys=None, mask=None):
    """One attention read.

    Args:
      params: attention params from `init`.
      h: (B, R) previous hidden state.
      att_feats: (B, A, D) spatial features.
      keys: optional precomputed (B, A, H) = Wa att (from `precompute_keys`).
      mask: optional (B, A) or (A,) boolean; False positions are excluded.

    Returns:
      z: (B, D) context vector.
      weights: (B, A) attention distribution.
    """
    if keys is None:
        keys = precompute_keys(params, att_feats)
    q = apply_linear(params["h_2_att_h"], h)  # (B, H)
    scores = jnp.tanh(keys + q[:, None, :])  # (B, A, H)
    scores = apply_linear(params["att_h_2_out"], scores)[..., 0]  # (B, A)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    # checkpoint_name: no-op under plain jax.checkpoint / no remat; under the
    # save_ctx remat policy (models: remat_policy="save_ctx") these small
    # per-step values — weights (B, A) and context (B, D) — are SAVED instead
    # of rematerialized, so the backward recompute subgraph never re-reads
    # the large loop-invariant (B, A, D) feature arrays from HBM a third
    # time (the dominant train-step traffic at flagship dims; PERF_NOTES §3).
    weights = checkpoint_name(jax.nn.softmax(scores, axis=-1), "attn_weights")
    z = checkpoint_name(jnp.einsum("ba,bad->bd", weights, att_feats), "attn_ctx")
    return z, weights
