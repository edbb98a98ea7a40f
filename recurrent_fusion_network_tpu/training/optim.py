"""Optimizers and schedules.

Mirrors the reference's optimizer surface (train.py:68-84: adam | rmsprop |
sgd | adagrad | adadelta with shared flags) on optax, with:

  * elementwise gradient clamping to [-grad_clip, grad_clip] BEFORE the
    optimizer (misc/utils.py:292-296 clip_gradient semantics — clamp, not
    norm clipping),
  * torch-style coupled weight decay (grad += wd * param) applied to the
    clipped gradient,
  * the learning rate applied OUTSIDE the transform so it can change every
    epoch without rebuilding optimizer state (utils.set_lr equivalent):
    `apply_updates(params, tx_direction, lr)`.

Also the epoch schedules: LR decay (train.py:93-101) and scheduled-sampling
ramp (train.py:102-106).
"""

from __future__ import annotations

import jax
import optax


def make_optimizer(opt):
    """Returns an optax transform producing an UN-scaled update direction
    (descent step = -lr * direction)."""
    name = opt.optim
    parts = [optax.clip(opt.grad_clip)]
    if opt.optim_weight_decay:
        parts.append(optax.add_decayed_weights(opt.optim_weight_decay))
    if name == "adam":
        parts.append(
            optax.scale_by_adam(
                b1=opt.optim_adam_beta1, b2=opt.optim_adam_beta2, eps=opt.optim_epsilon
            )
        )
    elif name == "rmsprop":
        parts.append(optax.scale_by_rms(decay=opt.optim_rmsprop_alpha,
                                        eps=opt.optim_epsilon))
        if opt.optim_momentum:
            parts.append(optax.trace(decay=opt.optim_momentum))
    elif name == "sgd":
        if opt.optim_momentum:
            parts.append(optax.trace(decay=opt.optim_momentum))
    elif name == "adagrad":
        parts.append(optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10))
    elif name == "adadelta":
        parts.append(optax.scale_by_adadelta(rho=opt.optim_rho, eps=opt.optim_epsilon))
    else:
        raise ValueError(f"optim not supported: {name}")
    return optax.chain(*parts)


def apply_updates(params, direction, lr):
    """params - lr * direction (the reference's set_lr + optimizer.step)."""
    return jax.tree_util.tree_map(lambda p, d: p - lr * d, params, direction)


def lr_for_epoch(opt, epoch: int, base_lr: float) -> float:
    """Epoch-staircase decay (train.py:93-101)."""
    if epoch > opt.learning_rate_decay_start >= 0:
        frac = (epoch - opt.learning_rate_decay_start) // opt.learning_rate_decay_every
        return base_lr * (opt.learning_rate_decay_rate ** frac)
    return base_lr


def ss_prob_for_epoch(opt, epoch: int) -> float:
    """Scheduled-sampling ramp (train.py:102-106)."""
    if epoch > opt.scheduled_sampling_start >= 0:
        frac = (epoch - opt.scheduled_sampling_start) // opt.scheduled_sampling_increase_every
        return min(opt.scheduled_sampling_increase_prob * frac, opt.scheduled_sampling_max_prob)
    return 0.0
