"""Training criterions.

Functional equivalents of the reference's ``misc/utils.py`` criterion modules:

  language_model_loss          — LanguageModelCriterion (misc/utils.py:252-284)
  multilabel_margin_loss       — torch.nn.MultiLabelMarginLoss semantics
  review_net_loss              — ReviewNetCriterion (misc/utils.py:212-249)
  review_net_ensemble_loss     — ReviewNetEnsembleCriterion (misc/utils.py:153-192)
  reward_loss                  — RewardCriterion (misc/utils.py:87-118)
  review_net_reward_loss       — ReviewNetRewardCriterion (misc/utils.py:44-84)

All losses normalize by batch size (NOT by mask sum), matching the reference.
All are pure jnp functions usable under jit/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def language_model_loss(
    log_prob,
    target,
    mask,
    *,
    use_label_smoothing: bool = False,
    label_smoothing_epsilon: float = 0.1,
):
    """Masked XE with optional label smoothing.

    log_prob: (B, T, V) log-probabilities. target: (B, >=T) int ids.
    mask: (B, >=T) float. Truncated to T like the reference (misc/utils.py:262-263).
    """
    B, T, V = log_prob.shape
    target = target[:, :T]
    mask = mask[:, :T].astype(log_prob.dtype)
    if use_label_smoothing:
        one_hot = jax.nn.one_hot(target, V, dtype=log_prob.dtype)
        smoothed = one_hot * (1.0 - label_smoothing_epsilon) + label_smoothing_epsilon / V
        nll = -jnp.sum(log_prob * smoothed, axis=2) * mask
    else:
        picked = jnp.take_along_axis(log_prob, target[..., None], axis=2)[..., 0]
        nll = -picked * mask
    return jnp.sum(nll) / B


def multilabel_margin_loss(x, y, *, max_targets: int | None = None):
    """torch.nn.MultiLabelMarginLoss with default 'mean' reduction.

    x: (B, C) scores. y: (B, K) int targets, -1-padded after the valid
    prefix (K may equal C as in the reference's top-words targets).

    loss_b = sum_{j: y_bj valid} sum_{i not in targets_b} max(0, 1 - (x[y_bj] - x[i])) / C
    returned as mean over the batch.

    ``max_targets`` statically truncates the target axis (valid targets in the
    captioning use never exceed seq_length+2 << C), keeping the pairwise
    tensor (B, K, C) small on TPU.
    """
    B, C = x.shape
    if max_targets is not None and y.shape[1] > max_targets:
        y = y[:, :max_targets]
    K = y.shape[1]
    # torch stops at the first -1; our targets are -1-padded at the tail only,
    # but replicate the semantics exactly with a cumulative validity mask.
    valid = jnp.cumprod((y >= 0).astype(jnp.int32), axis=1).astype(bool)  # (B, K)
    y_safe = jnp.where(valid, y, 0)
    # class-membership mask: is class c in the target set of sample b?
    one_hot = jax.nn.one_hot(y_safe, C, dtype=x.dtype) * valid[..., None]
    is_target = jnp.clip(jnp.sum(one_hot, axis=1), 0.0, 1.0)  # (B, C)
    x_target = jnp.take_along_axis(x, y_safe, axis=1)  # (B, K)
    margin = jax.nn.relu(1.0 - x_target[:, :, None] + x[:, None, :])  # (B, K, C)
    margin = margin * valid[:, :, None] * (1.0 - is_target)[:, None, :]
    per_sample = jnp.sum(margin, axis=(1, 2)) / C
    return jnp.mean(per_sample)


def review_net_loss(
    log_prob,
    target,
    mask,
    top_pred,
    top_true,
    reason_weight,
    *,
    use_label_smoothing=False,
    label_smoothing_epsilon=0.1,
    max_targets=None,
):
    """XE + single-head discriminative reason loss (misc/utils.py:220-248)."""
    xe = language_model_loss(
        log_prob,
        target,
        mask,
        use_label_smoothing=use_label_smoothing,
        label_smoothing_epsilon=label_smoothing_epsilon,
    )
    disc = multilabel_margin_loss(top_pred, top_true, max_targets=max_targets)
    return xe + disc * reason_weight


def review_net_ensemble_loss(
    log_prob,
    target,
    mask,
    top_pred_list,
    top_true,
    reason_weight,
    *,
    use_label_smoothing=False,
    label_smoothing_epsilon=0.1,
    max_targets=None,
):
    """XE + reason loss averaged over the M+1 reason heads (misc/utils.py:161-192)."""
    xe = language_model_loss(
        log_prob,
        target,
        mask,
        use_label_smoothing=use_label_smoothing,
        label_smoothing_epsilon=label_smoothing_epsilon,
    )
    disc = sum(
        multilabel_margin_loss(tp, top_true, max_targets=max_targets)
        for tp in top_pred_list
    )
    return xe + disc * reason_weight / len(top_pred_list)


def tv_loss(top_pred, top_true, *, max_targets=None):
    """Eval-only thought-vector criterion (TVCriterion, misc/utils.py:196-209):
    the discriminative loss of the LAST reason head alone."""
    if isinstance(top_pred, (list, tuple)):
        top_pred = top_pred[-1]
    return multilabel_margin_loss(top_pred, top_true, max_targets=max_targets)


def smooth_l1(x, y):
    """torch.nn.SmoothL1Loss(size_average=False) semantics."""
    d = jnp.abs(x - y)
    return jnp.sum(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def soft_att_plus_ltg_loss(
    log_prob, target, mask, gv, top_true, ltg_weight, gv_l1_penality,
    *, max_targets=None,
):
    """Guiding-network criterion (SoftAttPlusLTGCriterion,
    misc/utils.py:122-150): masked XE + guiding MultiLabelMargin loss +
    SmoothL1 pull of the guiding vector toward zero. Kept for surface parity
    (the guiding-net model itself is not part of the public reference
    release)."""
    xe = language_model_loss(log_prob, target, mask)
    gv_loss = multilabel_margin_loss(gv, top_true, max_targets=max_targets)
    gv_l1 = smooth_l1(gv, jnp.zeros_like(gv))
    return xe + gv_loss * ltg_weight + gv_l1 * gv_l1_penality


def _rl_masks(seq):
    """mask_0 = seq>0; mask = [1, mask_0[:, :-1]] (one extra step so the EOS
    step is rewarded; misc/utils.py:99-101)."""
    mask_0 = (seq > 0).astype(jnp.float32)
    mask = jnp.concatenate([jnp.ones_like(mask_0[:, :1]), mask_0[:, :-1]], axis=1)
    return mask_0, mask


def _entropy_term(logprobs_all, mask_0, T):
    """sum_v p log p per step, masked by mask_0 (misc/utils.py:103-105)."""
    lp = logprobs_all[:, :T, :]
    neg_ent = jnp.sum(lp * jnp.exp(lp), axis=2)
    return neg_ent * mask_0


def reward_loss(
    sample_logprobs,
    seq,
    reward,
    logprobs_all,
    entropy_reg,
    sample_logprobs_old=None,
    *,
    use_ppo: bool = False,
    ppo_clip: float = 0.2,
):
    """SCST policy-gradient loss (RewardCriterion, misc/utils.py:93-118).

    sample_logprobs: (B, T) log-prob of each sampled token.
    seq: (B, T) sampled ids (0 once finished). reward: (B, T).
    logprobs_all: (B, >=T, V) full per-step log-distributions (entropy reg).

    PPO note (deliberate divergence): the clipped surrogate here clamps the
    RATIO for every model — the standard PPO objective and what the
    reference's show_tell RewardCriterion does (misc/utils.py:110-113). The
    reference's ReviewNetRewardCriterion instead clamps surr1 = ratio*reward
    (misc/utils.py:68), which inverts the trust region whenever reward < 0;
    that is a reference bug, not a semantic choice, so it is not replicated.
    """
    B, T = sample_logprobs.shape
    mask_0, mask = _rl_masks(seq)
    if use_ppo:
        if sample_logprobs_old is None:
            # fail at the call site, not as jnp.exp(None) deep in a trace
            raise ValueError(
                "use_ppo=True requires sample_logprobs_old (the frozen "
                "rollout log-probs; see train_rl_loop's old_logprobs_fn)"
            )
        # exp(a)/(1e-5+exp(b)) reproduces the reference exactly
        # (misc/utils.py:108-110). NOTE the epsilon is not inert: for tokens
        # with logprob_old < ln(1e-5) ~ -11.5 it shrinks the ratio below the
        # true exp(a-b) (e.g. a==b gives 0.38, not 1.0), down-weighting rare
        # tokens. Kept for parity; the numerically-exact form would be
        # jnp.exp(sample_logprobs - sample_logprobs_old).
        ratio = jnp.exp(sample_logprobs) / (1e-5 + jnp.exp(sample_logprobs_old))
        surr1 = ratio * reward
        surr2 = jnp.clip(ratio, 1.0 - ppo_clip, 1.0 + ppo_clip) * reward
        out = -jnp.minimum(surr1, surr2) * mask
    else:
        out = -sample_logprobs * reward * mask
    ent = _entropy_term(logprobs_all, mask_0, T)
    return jnp.sum(out) / B + entropy_reg * jnp.sum(ent) / B


def review_net_reward_loss(
    sample_logprobs,
    seq,
    reward,
    logprobs_all,
    entropy_reg,
    top_pred,
    top_true,
    reason_weight,
    sample_logprobs_old=None,
    *,
    use_ppo: bool = False,
    ppo_clip: float = 0.2,
    max_targets=None,
):
    """SCST loss + discriminative reason head(s)
    (ReviewNetRewardCriterion, misc/utils.py:50-84). ``top_pred`` may be a
    single (B, C) array or a list of them (RFNet's M+1 heads)."""
    base = reward_loss(
        sample_logprobs,
        seq,
        reward,
        logprobs_all,
        entropy_reg,
        sample_logprobs_old,
        use_ppo=use_ppo,
        ppo_clip=ppo_clip,
    )
    if isinstance(top_pred, (list, tuple)):
        disc = sum(
            multilabel_margin_loss(tp, top_true, max_targets=max_targets)
            for tp in top_pred
        ) / len(top_pred)
    else:
        disc = multilabel_margin_loss(top_pred, top_true, max_targets=max_targets)
    return base + disc * reason_weight
