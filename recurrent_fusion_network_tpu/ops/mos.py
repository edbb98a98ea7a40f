"""Mixture-of-Softmax output head (Yang et al. 2017, arXiv:1711.03953).

Functional equivalent of the reference's ``MixtureOfSoftmax``
(misc/MixtureOfSoftmax.py:23-34): a softmax prior over ``n_experts``, a
per-expert tanh latent projection, a shared decoder, and a probability
mixture. The per-expert latents are stacked on a leading expert axis and
evaluated with one batched einsum instead of the reference's Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .initializers import linear


def init(key, rnn_size: int, emb_size: int, n_experts: int, dict_size: int):
    k_prior, k_lat, k_dec = jax.random.split(key, 3)
    lat_keys = jax.random.split(k_lat, n_experts)
    latents = [linear(k, rnn_size, emb_size, weight="default", bias="default") for k in lat_keys]
    stack = lambda ps: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ps)
    return {
        "prior": linear(k_prior, rnn_size, n_experts, weight="default", bias=None),
        "latent": stack(latents),  # leading axis E
        "decoder": linear(k_dec, emb_size, dict_size, weight="default", bias="default"),
    }


def apply(params, output):
    """output: (B, R) -> mixture probabilities (B, V)."""
    prior = jax.nn.softmax(output @ params["prior"]["w"], axis=-1)  # (B, E)
    # (B, R) x (E, R, M) -> (E, B, M)
    latent = jnp.tanh(
        jnp.einsum("br,erm->ebm", output, params["latent"]["w"])
        + params["latent"]["b"][:, None, :]
    )
    logits = (
        jnp.einsum("ebm,mv->ebv", latent, params["decoder"]["w"])
        + params["decoder"]["b"]
    )
    probs = jax.nn.softmax(logits, axis=-1)  # (E, B, V)
    return jnp.einsum("ebv,be->bv", probs, prior)


def log_apply(params, output, eps: float = 1e-12):
    """log of the mixture probability (reference calls torch.log(mos(...)),
    misc/ReviewNetModel.py:123); eps guards log(0)."""
    return jnp.log(apply(params, output).astype(jnp.float32) + eps)
