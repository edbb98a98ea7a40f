"""Criterion dispatch per caption model (train.py:56-66)."""

from __future__ import annotations

from ..ops import losses


def make_criterion(opt):
    """Returns crit(log_prob, labels, masks, reason_preds, top_words) -> loss.

    labels/masks are the FULL (B, L+2) arrays; the criterion consumes
    labels[:, 1:] / masks[:, 1:] like the reference call sites
    (train.py:145-155).
    """
    use_ls = bool(opt.use_label_smoothing)
    eps = opt.label_smoothing_epsilon
    max_targets = (opt.seq_length or 16) + 2
    model_name = opt.caption_model
    reason_weight = opt.reason_weight

    def crit(log_prob, labels, masks, reason_preds, top_words):
        target, mask = labels[:, 1:], masks[:, 1:]
        if model_name == "show_tell":
            return losses.language_model_loss(
                log_prob, target, mask,
                use_label_smoothing=use_ls, label_smoothing_epsilon=eps,
            )
        if model_name == "review_net":
            return losses.review_net_loss(
                log_prob, target, mask, reason_preds[0], top_words, reason_weight,
                use_label_smoothing=use_ls, label_smoothing_epsilon=eps,
                max_targets=max_targets,
            )
        if model_name == "recurrent_fusion_model":
            return losses.review_net_ensemble_loss(
                log_prob, target, mask, list(reason_preds), top_words, reason_weight,
                use_label_smoothing=use_ls, label_smoothing_epsilon=eps,
                max_targets=max_targets,
            )
        raise ValueError(f"caption_model not supported: {model_name}")

    return crit


def make_rl_criterion(opt):
    """SCST criterion dispatch (train_rl.py:62-75)."""
    model_name = opt.caption_model
    max_targets = (opt.seq_length or 16) + 2

    def crit(sample_logprobs, seq, reward, logprobs_all, reason_preds, top_words,
             sample_logprobs_old=None):
        if model_name == "show_tell":
            return losses.reward_loss(
                sample_logprobs, seq, reward, logprobs_all, opt.entropy_reg,
                sample_logprobs_old, use_ppo=bool(opt.use_ppo), ppo_clip=opt.ppo_clip,
            )
        if model_name not in ("review_net", "recurrent_fusion_model"):
            # mirror make_criterion's explicit dispatch: an unknown model
            # previously fell through to the ensemble loss and died as a
            # ZeroDivisionError (or scored a wrong loss) inside the trace
            raise ValueError(f"caption_model not supported: {model_name}")
        top_pred = reason_preds[0] if model_name == "review_net" else list(reason_preds)
        return losses.review_net_reward_loss(
            sample_logprobs, seq, reward, logprobs_all, opt.entropy_reg,
            top_pred, top_words, opt.reason_weight, sample_logprobs_old,
            use_ppo=bool(opt.use_ppo), ppo_clip=opt.ppo_clip, max_targets=max_targets,
        )

    return crit
