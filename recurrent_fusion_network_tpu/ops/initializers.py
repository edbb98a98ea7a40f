"""Parameter initializers matching the reference's init scheme.

The reference initializes most weights from U(-0.1, 0.1) (`initrange = 0.1`,
e.g. misc/LSTMSoftAttentionCore.py:42-58), fills some biases with constants
(misc/LSTMSoftAttentionNoInputCore.py:40-51), and leaves the rest at the
PyTorch ``nn.Linear`` default U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

Linear layers here are stored as ``{"w": (in, out), "b": (out,)}`` so the
forward pass is ``x @ w + b`` — activation-major matmuls that tile directly
onto the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

INITRANGE = 0.1


def uniform(key, shape, scale=INITRANGE, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)


def linear(
    key,
    in_dim: int,
    out_dim: int,
    *,
    weight: str = "uniform",
    bias: str | float | None = "default",
    dtype=jnp.float32,
):
    """Create a linear layer's params.

    weight: "uniform" -> U(-0.1, 0.1);  "default" -> torch nn.Linear default.
    bias:   "uniform" | "default" | float fill | None (no bias).
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    if weight == "uniform":
        w = uniform(kw, (in_dim, out_dim), dtype=dtype)
    elif weight == "default":
        w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    else:
        raise ValueError(weight)
    params = {"w": w}
    if bias is None:
        return params
    if bias == "uniform":
        params["b"] = uniform(kb, (out_dim,), dtype=dtype)
    elif bias == "default":
        params["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    elif isinstance(bias, (int, float)):
        params["b"] = jnp.full((out_dim,), float(bias), dtype=dtype)
    else:
        raise ValueError(bias)
    return params


def apply_linear(params, x):
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def stack_params(param_list):
    """Stack a list of identically-shaped param pytrees along a new leading
    axis — used to turn per-review-step untied weights into scan inputs."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *param_list)
