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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaleByAdagradState(NamedTuple):
    count: jnp.ndarray  # step number, int32 scalar
    sum_sq: optax.Params  # per-leaf accumulated squared gradients


def scale_by_torch_adagrad(lr_decay: float = 0.0, eps: float = 1e-10):
    """torch.optim.Adagrad semantics: update = g / (sqrt(sum g^2) + eps),
    scaled by 1/(1 + (step-1)*lr_decay). optax's scale_by_rss puts eps
    INSIDE the sqrt, which inflates early tiny-gradient steps ~sqrt(eps)/|g|;
    torch's placement (and the reference's train.py:77-79 lr_decay knob)
    is reproduced exactly here."""

    def init(params):
        return ScaleByAdagradState(
            count=jnp.zeros((), jnp.int32),
            sum_sq=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        sum_sq = jax.tree_util.tree_map(
            lambda s, g: s + jnp.square(g), state.sum_sq, updates
        )
        clr = 1.0 / (1.0 + (count - 1).astype(jnp.float32) * lr_decay)
        updates = jax.tree_util.tree_map(
            lambda g, s: clr * g / (jnp.sqrt(s) + eps), updates, sum_sq
        )
        return updates, ScaleByAdagradState(count=count, sum_sq=sum_sq)

    return optax.GradientTransformation(init, update)


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
        # eps_in_sqrt=False: torch RMSprop scales by g/(sqrt(nu)+eps);
        # optax's default g/sqrt(nu+eps) differs ~10x whenever nu <~ eps
        # (early training / small-gradient params)
        parts.append(optax.scale_by_rms(decay=opt.optim_rmsprop_alpha,
                                        eps=opt.optim_epsilon,
                                        eps_in_sqrt=False))
        if opt.optim_momentum:
            parts.append(optax.trace(decay=opt.optim_momentum))
    elif name == "sgd":
        if opt.optim_momentum:
            parts.append(optax.trace(decay=opt.optim_momentum))
    elif name == "adagrad":
        parts.append(scale_by_torch_adagrad(
            lr_decay=getattr(opt, "optim_lr_decay", 0.0) or 0.0))
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
