"""End-to-end SCST (RL) GRAD-STEP differential test vs torch.

train_rl_loop's gradient path re-evaluates a FIXED sampled sequence with
teacher forcing and applies the policy-gradient criterion
(make_rl_step.losses_of: forward -> gather sampled-token logprobs ->
review_net_reward_loss with entropy regularization / PPO surrogate +
M+1 MultiLabelMargin reason heads, the reference's
misc/utils.py:44-84 ReviewNetRewardCriterion as called at
train_rl.py:186-200). This test restates that whole composition in float64
torch and compares the loss and the gradient at EVERY parameter leaf.
The sampling itself is RNG-dependent and deliberately out of scope
(PARITY.md "RNG parity"); the sequence is a fixed input here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from recurrent_fusion_network_tpu.models import RecurrentFusionModel

from test_rfnet_torch_differential import _torch_f64, torch_rfnet_forward  # noqa: F401


def torch_rl_criterion(lps, reason_preds, seq, reward, top_words, *,
                       entropy_reg, reason_weight, slp_old=None, ppo_clip=0.2):
    """ReviewNetRewardCriterion restated (misc/utils.py:50-84), with the
    ratio-clamped PPO surrogate (the framework's documented fix of the
    reference's surr1-clamp bug — ops/losses.py:190-196)."""
    B = lps.shape[0]
    T = seq.shape[1]
    seq_t = torch.from_numpy(seq)
    lp = lps[:, :T, :]
    sample_logprobs = lp.gather(2, seq_t.unsqueeze(-1)).squeeze(-1)
    mask_0 = (seq_t > 0).to(lp.dtype)
    mask = torch.cat([torch.ones_like(mask_0[:, :1]), mask_0[:, :-1]], dim=1)
    r = torch.from_numpy(reward)
    if slp_old is not None:
        ratio = sample_logprobs.exp() / (1e-5 + torch.from_numpy(slp_old).exp())
        surr1 = ratio * r
        surr2 = torch.clamp(ratio, 1.0 - ppo_clip, 1.0 + ppo_clip) * r
        out = -torch.minimum(surr1, surr2) * mask
    else:
        out = -sample_logprobs * r * mask
    ent = (lp * lp.exp()).sum(-1) * mask_0
    base = out.sum() / B + entropy_reg * ent.sum() / B

    mlm = torch.nn.MultiLabelMarginLoss()
    y = torch.from_numpy(top_words)
    disc = sum(mlm(x, y) for x in reason_preds) / len(reason_preds)
    return base + reason_weight * disc


@pytest.mark.parametrize("use_ppo", [False, True])
def test_rl_step_loss_and_grads_match_torch(use_ppo):
    from recurrent_fusion_network_tpu.config import Options
    from recurrent_fusion_network_tpu.training.criterion import make_rl_criterion

    model = RecurrentFusionModel(
        vocab_size=12, seq_length=5,
        fc_feat_sizes=(7, 5), att_feat_sizes=(9, 6), att_nums=(4, 3),
        input_encoding_size=8, rnn_size=8, att_hid_size=8,
        num_review_steps=2, num_review_steps_0=3, top_words_count=6,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    g = np.random.default_rng(2)
    B, L = 3, model.seq_length
    fcs = [g.standard_normal((B, d)).astype(np.float32) for d in model.fc_feat_sizes]
    atts = [g.standard_normal((B, n, d)).astype(np.float32)
            for n, d in zip(model.att_nums, model.att_feat_sizes)]
    # sampled rollout with realistic early-EOS rows (zeros after finish)
    seq = g.integers(1, 13, (B, L)).astype(np.int64)
    seq[0, 3:] = 0
    seq[1, 1:] = 0
    reward = g.standard_normal((B, L)).astype(np.float32)
    slp_old = (0.1 * g.standard_normal((B, L)) - 1.5).astype(np.float32) \
        if use_ppo else None
    top_words = np.full((B, model.top_words_count), -1, np.int64)
    top_words[:, :2] = g.integers(0, model.top_words_count, (B, 2))

    opt = Options(
        caption_model="recurrent_fusion_model",
        feature_type="feat_array",
        feat_array_info=[
            {"fc_feat_size": f, "att_feat_size": a, "att_num": n}
            for f, a, n in zip(model.fc_feat_sizes, model.att_feat_sizes,
                               model.att_nums)
        ],
        entropy_reg=0.01,
        reason_weight=0.3,
        use_ppo=int(use_ppo),
        ppo_clip=0.2,
    )
    opt.vocab_size = model.vocab_size
    opt.seq_length = model.seq_length
    rl_crit = make_rl_criterion(opt)

    def loss_fn(p):
        # the exact teacher-forced composition of train_rl_loop's
        # make_rl_step.losses_of (train_rl_loop.py:105-118)
        full = jnp.zeros((B, L + 2), jnp.int32).at[:, 1 : L + 1].set(
            jnp.asarray(seq)
        )
        lps, reason = model.forward(
            p, [jnp.asarray(f) for f in fcs], [jnp.asarray(a) for a in atts],
            full,
        )
        sample_logprobs = jnp.take_along_axis(
            lps[:, :L, :], jnp.asarray(seq)[..., None], axis=2
        )[..., 0]
        return rl_crit(
            sample_logprobs, jnp.asarray(seq), jnp.asarray(reward), lps,
            reason, jnp.asarray(top_words),
            None if slp_old is None else jnp.asarray(slp_old),
        )

    loss_jax, grads_jax = jax.value_and_grad(loss_fn)(params)

    tparams = jax.tree_util.tree_map(
        lambda x: torch.tensor(np.asarray(x, np.float64), requires_grad=True),
        params,
    )
    labels = np.zeros((B, L + 2), np.int64)
    labels[:, 1 : L + 1] = seq
    lps_t, reason_t = torch_rfnet_forward(model, tparams, fcs, atts, labels)
    loss_t = torch_rl_criterion(
        lps_t, reason_t, seq, reward.astype(np.float64), top_words,
        entropy_reg=opt.entropy_reg, reason_weight=opt.reason_weight,
        slp_old=None if slp_old is None else slp_old.astype(np.float64),
        ppo_clip=opt.ppo_clip,
    )
    loss_t.backward()

    np.testing.assert_allclose(
        float(loss_jax), loss_t.item(), rtol=1e-5,
        err_msg="RL-step loss diverges from the torch reference step",
    )
    flat_j = jax.tree_util.tree_flatten_with_path(grads_jax)[0]
    flat_t = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(
            lambda x: np.zeros_like(np.asarray(x.detach()))
            if x.grad is None else x.grad.numpy(),
            tparams,
        )
    )[0]
    assert len(flat_j) == len(flat_t) and len(flat_j) > 20
    for (path, gj), gt in zip(flat_j, flat_t):
        np.testing.assert_allclose(
            np.asarray(gj), gt, rtol=2e-3, atol=2e-5,
            err_msg=f"gradient diverges at {jax.tree_util.keystr(path)}",
        )
