"""Attention-LSTM single-step cells.

Functional equivalents of the reference's four cell variants, all sharing the
same gate layout (preactivation chunks [in | forget | out | g], sigmoid on the
first 3R, tanh — or maxout over two chunks — on the last; e.g.
misc/LSTMSoftAttentionCore.py:81-102):

  att_lstm        — LSTMSoftAttentionCore: i2h(x) + h2h(h) + z2h(z)
  no_input_lstm   — LSTMSoftAttentionNoInputCore (intended semantics, the
                    reference's signature is bitrotted): h2h(h) + z2h(z)
  fusion_lstm     — LSTMFusionNoInputCore: H2h(H) + z2h(z) where H is the
                    concatenation of all encoders' hidden states
                    (misc/RecurrentFusionModel.py:47-74)
  multi_att_lstm  — LSTMSoftMultiAttentionFeatArrayNoInputCore: h2h(h) +
                    sum_i z_2_h[i](z_i) over M homogeneous feature sets
                    (misc/LSTMSoftMultiAttentionFeatArrayNoInputCore.py:41-73)

Dropout is applied to next_h before it is returned as BOTH the output and the
recurrent state, matching the reference (misc/LSTMSoftAttentionCore.py:98-102).

State is a plain ``(h, c)`` tuple of (B, R) arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import attention
from .initializers import apply_linear, linear


def maybe_dropout(rng, x, rate: float, deterministic: bool):
    if deterministic or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def lstm_update(all_input_sums, pre_c, rnn_size: int, maxout: bool):
    """Gate math shared by every cell variant."""
    sig = jax.nn.sigmoid(all_input_sums[:, : 3 * rnn_size])
    in_gate = sig[:, :rnn_size]
    forget_gate = sig[:, rnn_size : 2 * rnn_size]
    out_gate = sig[:, 2 * rnn_size : 3 * rnn_size]
    if maxout:
        in_transform = jnp.maximum(
            all_input_sums[:, 3 * rnn_size : 4 * rnn_size],
            all_input_sums[:, 4 * rnn_size : 5 * rnn_size],
        )
    else:
        in_transform = jnp.tanh(all_input_sums[:, 3 * rnn_size : 4 * rnn_size])
    next_c = forget_gate * pre_c + in_gate * in_transform
    next_h = out_gate * jnp.tanh(next_c)
    return next_h, next_c


def _gate_dim(rnn_size: int, maxout: bool) -> int:
    return (5 if maxout else 4) * rnn_size


# ---------------------------------------------------------------------------
# att_lstm — decoder cell (LSTMSoftAttentionCore)
# ---------------------------------------------------------------------------


def att_lstm_init(
    key, input_encoding_size, rnn_size, att_feat_size, att_hid_size, maxout=False
):
    g = _gate_dim(rnn_size, maxout)
    k_att, k_i, k_h, k_z = jax.random.split(key, 4)
    return {
        "att": attention.init(k_att, rnn_size, att_feat_size, att_hid_size, bias="uniform"),
        "i2h": linear(k_i, input_encoding_size, g, bias="uniform"),
        "h2h": linear(k_h, rnn_size, g, bias="uniform"),
        "z2h": linear(k_z, att_feat_size, g, bias="uniform"),
    }


def att_lstm_step(
    params,
    xt,
    att_feats,
    state,
    *,
    keys=None,
    mask=None,
    rnn_size: int,
    maxout: bool = False,
    drop_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
):
    pre_h, pre_c = state
    z, _ = attention.attend(params["att"], pre_h, att_feats, keys=keys, mask=mask)
    sums = (
        apply_linear(params["i2h"], xt)
        + apply_linear(params["h2h"], pre_h)
        + apply_linear(params["z2h"], z)
    )
    next_h, next_c = lstm_update(sums, pre_c, rnn_size, maxout)
    next_h = maybe_dropout(rng, next_h, drop_rate, deterministic)
    return next_h, (next_h, next_c)


# ---------------------------------------------------------------------------
# no_input_lstm — ReviewNet review cell (LSTMSoftAttentionNoInputCore)
# ---------------------------------------------------------------------------


def no_input_lstm_init(key, rnn_size, att_feat_size, att_hid_size, maxout=False):
    g = _gate_dim(rnn_size, maxout)
    k_att, k_h, k_z = jax.random.split(key, 3)
    # Bias fills match misc/LSTMSoftAttentionNoInputCore.py:38-51.
    return {
        "att": attention.init(k_att, rnn_size, att_feat_size, att_hid_size, bias=0.0),
        "h2h": linear(k_h, rnn_size, g, bias=-1.0),
        "z2h": linear(k_z, att_feat_size, g, bias=-1.0),
    }


def no_input_lstm_step(
    params,
    att_feats,
    state,
    *,
    keys=None,
    mask=None,
    rnn_size: int,
    maxout: bool = False,
    drop_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
):
    pre_h, pre_c = state
    z, _ = attention.attend(params["att"], pre_h, att_feats, keys=keys, mask=mask)
    sums = apply_linear(params["h2h"], pre_h) + apply_linear(params["z2h"], z)
    next_h, next_c = lstm_update(sums, pre_c, rnn_size, maxout)
    next_h = maybe_dropout(rng, next_h, drop_rate, deterministic)
    return next_h, (next_h, next_c)


# ---------------------------------------------------------------------------
# fusion_lstm — RFNet review-I cell (LSTMFusionNoInputCore)
# ---------------------------------------------------------------------------


def fusion_lstm_init(key, H_size, rnn_size, att_feat_size, att_hid_size,
                     maxout=False, ctx_size=None):
    """ctx_size: dimension of the attention CONTEXT consumed by z2h.
    Defaults to att_feat_size (contexts are weighted sums of the raw
    features, reference semantics); the low_rank_ctx model variant passes
    rnn_size because its values are pre-projected once per sequence."""
    g = _gate_dim(rnn_size, maxout)
    k_att, k_H, k_z = jax.random.split(key, 3)
    # Weight-only uniform init; biases keep the torch Linear default
    # (misc/RecurrentFusionModel.py:42-45 only sets .weight).
    return {
        "att": attention.init(k_att, rnn_size, att_feat_size, att_hid_size, bias="uniform"),
        "H2h": linear(k_H, H_size, g, bias="default"),
        "z2h": linear(k_z, ctx_size or att_feat_size, g, bias="default"),
    }


def fusion_lstm_step(
    params,
    H,
    att_feats,
    state,
    *,
    keys=None,
    mask=None,
    rnn_size: int,
    maxout: bool = False,
    drop_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
):
    """One fusion step: the cell sees the concatenated hidden states H of ALL
    encoders plus attention over its own encoder's spatial features
    (misc/RecurrentFusionModel.py:47-74)."""
    pre_h, pre_c = state
    z, _ = attention.attend(params["att"], pre_h, att_feats, keys=keys, mask=mask)
    sums = apply_linear(params["H2h"], H) + apply_linear(params["z2h"], z)
    next_h, next_c = lstm_update(sums, pre_c, rnn_size, maxout)
    next_h = maybe_dropout(rng, next_h, drop_rate, deterministic)
    return next_h, (next_h, next_c)


# ---------------------------------------------------------------------------
# multi_att_lstm — RFNet review-II cell
# (LSTMSoftMultiAttentionFeatArrayNoInputCore over M homogeneous feature sets)
# ---------------------------------------------------------------------------


def multi_att_lstm_init(
    key, rnn_size, att_feat_size, num_feat_array, att_hid_size, maxout=False
):
    """All M attention heads / z-projections are stacked on a leading M axis.

    In RFNet review-II every feature set is a (B, R0, rnn_size) thought-vector
    stack, so the M heads are homogeneous and vmap-able — unlike the
    reference's Python list of modules.
    """
    g = _gate_dim(rnn_size, maxout)
    k_h, k_att, k_z = jax.random.split(key, 3)
    att_keys = jax.random.split(k_att, num_feat_array)
    z_keys = jax.random.split(k_z, num_feat_array)
    atts = [
        attention.init(k, rnn_size, att_feat_size, att_hid_size, bias="uniform")
        for k in att_keys
    ]
    # z_2_h keeps torch default for WEIGHT and bias — the reference
    # re-initializes only h2h in this cell
    # (misc/LSTMSoftMultiAttentionFeatArrayNoInputCore.py:36-38); the
    # attention heads self-init uniform inside AttentionModelCore.
    z2hs = [linear(k, att_feat_size, g, weight="default", bias="default")
            for k in z_keys]
    stack = lambda ps: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ps)
    return {
        "h2h": linear(k_h, rnn_size, g, bias="uniform"),
        "att": stack(atts),  # leading axis M
        "z_2_h": stack(z2hs),  # leading axis M
    }


def multi_att_lstm_step(
    params,
    att_feats_stack,
    state,
    *,
    keys_stack=None,
    mask=None,
    rnn_size: int,
    maxout: bool = False,
    drop_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
):
    """att_feats_stack: (M, B, A, D) homogeneous feature sets."""
    pre_h, pre_c = state

    def one_head(att_params, feats, keys):
        z, _ = attention.attend(att_params, pre_h, feats, keys=keys, mask=mask)
        return z

    if keys_stack is None:
        z_stack = jax.vmap(lambda p, f: one_head(p, f, None))(
            params["att"], att_feats_stack
        )
    else:
        z_stack = jax.vmap(one_head)(params["att"], att_feats_stack, keys_stack)
    # sums = h2h(h) + sum_i z_i @ W_i + sum_i b_i
    sums = apply_linear(params["h2h"], pre_h)
    sums = sums + jnp.einsum("mbd,mdg->bg", z_stack, params["z_2_h"]["w"])
    sums = sums + jnp.sum(params["z_2_h"]["b"], axis=0)
    next_h, next_c = lstm_update(sums, pre_c, rnn_size, maxout)
    next_h = maybe_dropout(rng, next_h, drop_rate, deterministic)
    return next_h, (next_h, next_c)


# ---------------------------------------------------------------------------
# plain_lstm — bias-free vanilla LSTM (ShowTell core, torch nn.LSTM(bias=False))
# ---------------------------------------------------------------------------


def plain_lstm_init(key, input_size, rnn_size):
    """Bias-free LSTM layer params (misc/ShowTellModel.py:26 uses
    nn.LSTM(..., bias=False)); torch-default uniform init U(-1/sqrt(R), 1/sqrt(R))."""
    k_i, k_h = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(rnn_size)
    wi = jax.random.uniform(k_i, (input_size, 4 * rnn_size), jnp.float32, -bound, bound)
    wh = jax.random.uniform(k_h, (rnn_size, 4 * rnn_size), jnp.float32, -bound, bound)
    return {"i2h": {"w": wi}, "h2h": {"w": wh}}


def plain_lstm_step(params, xt, state, *, rnn_size: int):
    pre_h, pre_c = state
    sums = xt @ params["i2h"]["w"] + pre_h @ params["h2h"]["w"]
    next_h, next_c = lstm_update(sums, pre_c, rnn_size, maxout=False)
    return next_h, (next_h, next_c)
