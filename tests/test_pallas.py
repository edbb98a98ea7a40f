"""Fused Pallas attention-LSTM kernel tests (interpret mode on the CPU
backend; the same kernel compiles via Mosaic on TPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_fusion_network_tpu.decoding.api import model_sample
from recurrent_fusion_network_tpu.models import ReviewNetModel
from recurrent_fusion_network_tpu.ops import attention, cells
from recurrent_fusion_network_tpu.ops.pallas_kernels import (
    fused_att_lstm_step,
    pack_att_lstm_params,
)


@pytest.mark.parametrize("B,A,D,R,E", [(8, 8, 16, 16, 16), (6, 5, 24, 16, 8)])
def test_kernel_matches_jnp_cell(B, A, D, R, E):
    key = jax.random.PRNGKey(0)
    params = cells.att_lstm_init(key, E, R, D, R)
    xt = jax.random.normal(jax.random.fold_in(key, 1), (B, E))
    att = jax.random.normal(jax.random.fold_in(key, 2), (B, A, D))
    h = jax.random.normal(jax.random.fold_in(key, 3), (B, R))
    c = jax.random.normal(jax.random.fold_in(key, 4), (B, R))
    keys = attention.precompute_keys(params["att"], att)
    _, (h_ref, c_ref) = cells.att_lstm_step(
        params, xt, att, (h, c), keys=keys, rnn_size=R
    )
    wxh, wz, gb = pack_att_lstm_params(params)
    h_k, c_k = fused_att_lstm_step(
        xt, h, c, att, keys, params["att"], wxh, wz, gb,
        rnn_size=R, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), rtol=1e-4, atol=1e-6)


def test_pallas_decode_path_matches_reference_path():
    m = ReviewNetModel(
        vocab_size=30, seq_length=6, input_encoding_size=16, rnn_size=16,
        att_hid_size=16, fc_feat_size=8, att_feat_size=10, att_num=6,
        num_review_steps=3, top_words_count=8,
    )
    p = m.init_params(jax.random.PRNGKey(0))
    fc = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    att = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 10))
    ref = model_sample(m, p, fc, att, beam_size=3)
    pal = model_sample(dataclasses.replace(m, use_pallas=True), p, fc, att, beam_size=3)
    np.testing.assert_array_equal(np.asarray(ref.seq), np.asarray(pal.seq))
    np.testing.assert_allclose(np.asarray(ref.top_p), np.asarray(pal.top_p), rtol=1e-4)


@pytest.mark.parametrize("family", ["review_net", "recurrent_fusion_model"])
def test_grad_paths_bypass_pallas(family):
    """--use_pallas must never route a differentiated forward through the
    fused kernel (it has no autodiff rule) — covers the XE and SCST gradient
    paths of BOTH attention model families (regression: RFNet's
    decode_logprobs used to drop the allow_pallas gate)."""
    import jax.numpy as jnp

    from recurrent_fusion_network_tpu.models import RecurrentFusionModel

    if family == "review_net":
        m = ReviewNetModel(
            vocab_size=20, seq_length=5, input_encoding_size=8, rnn_size=8,
            att_hid_size=8, fc_feat_size=6, att_feat_size=6, att_num=4,
            num_review_steps=2, top_words_count=5, use_pallas=True,
        )
        p = m.init_params(jax.random.PRNGKey(0))
        fc = jax.random.normal(jax.random.PRNGKey(1), (3, 6))
        att = jax.random.normal(jax.random.PRNGKey(2), (3, 4, 6))
    else:
        m = RecurrentFusionModel(
            vocab_size=20, seq_length=5, fc_feat_sizes=(6, 5),
            att_feat_sizes=(6, 4), att_nums=(4, 3), input_encoding_size=8,
            rnn_size=8, att_hid_size=8, num_review_steps=2,
            num_review_steps_0=2, top_words_count=5, use_pallas=True,
        )
        p = m.init_params(jax.random.PRNGKey(0))
        fc = [jax.random.normal(jax.random.PRNGKey(1), (3, d)) for d in (6, 5)]
        att = [jax.random.normal(jax.random.PRNGKey(2), (3, n, d))
               for n, d in ((4, 6), (3, 4))]
    seq = jax.random.randint(jax.random.PRNGKey(3), (3, 7), 0, 21)
    g = jax.grad(lambda p: float(0) + jnp.sum(m.forward(p, fc, att, seq)[0]))(p)
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(g)[0])).all()


def test_bf16_decode_through_pallas():
    """--dtype bfloat16 + --use_pallas: the kernel's outputs must follow the
    bf16 state dtype (regression: fixed f32 out_shape broke the scan carry)."""
    from recurrent_fusion_network_tpu.training.eval_split import cast_tree

    m = ReviewNetModel(
        vocab_size=20, seq_length=5, input_encoding_size=8, rnn_size=8,
        att_hid_size=8, fc_feat_size=6, att_feat_size=6, att_num=4,
        num_review_steps=2, top_words_count=5, use_pallas=True,
    )
    import jax.numpy as jnp

    p = cast_tree(m.init_params(jax.random.PRNGKey(0)), jnp.bfloat16)
    fc = jax.random.normal(jax.random.PRNGKey(1), (3, 6), jnp.bfloat16)
    att = jax.random.normal(jax.random.PRNGKey(2), (3, 4, 6), jnp.bfloat16)
    out = model_sample(m, p, fc, att, beam_size=2)
    assert np.asarray(out.seq).shape == (3, 5)
