"""Fused attention-LSTM Pallas TPU kernel.

One kernel per decode step computing, entirely in VMEM (no HBM round trips
for the attention intermediates):

  q       = h @ Wq + bq                      (B, H)
  scores  = tanh(keys + q) @ wv + bv         (B, A)   [keys precomputed]
  weights = softmax(scores)                  (B, A)
  z       = weights . att                    (B, D)
  sums    = [xt, h] @ Wxh + z @ Wz + b       (B, G)
  h', c'  = LSTM gate update                 (B, R)

This fuses the reference's AttentionModelCore + LSTMSoftAttentionCore step
(misc/LSTMSoftAttentionCore.py:60-102) into a single MXU/VPU program; the
token and recurrent projections are one concatenated matmul. The grid tiles
the batch; weights are broadcast to every tile.

Used on the decode hot path (eval/beam/RL rollouts — deterministic, no
dropout). The jnp path in ops/cells.py remains the autodiff/training path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xh_ref, c_ref, att_ref, keys_ref, wq_ref, bq_ref, wv_ref, bv_ref,
            wxh_ref, wz_ref, b_ref, h_out_ref, c_out_ref, *, rnn_size: int):
    xh = xh_ref[:]  # (TB, E+R) concatenated [xt, h]
    h = xh[:, -rnn_size:]
    TB, A, _ = att_ref.shape
    H = keys_ref.shape[-1]
    # attention (2-D reshapes keep every dot MXU-shaped for Mosaic)
    q = jnp.dot(h, wq_ref[:], preferred_element_type=jnp.float32) + bq_ref[:]
    scored = jnp.tanh(keys_ref[:] + q[:, None, :])  # (TB, A, H)
    scores = (
        jnp.dot(
            scored.reshape(TB * A, H), wv_ref[:],
            preferred_element_type=jnp.float32,
        ).reshape(TB, A)
        + bv_ref[0]
    )
    weights = jax.nn.softmax(scores, axis=-1)
    # context: (TB, A) x (TB, A, D) -> (TB, D), batched matvec on the MXU
    z = jax.lax.dot_general(
        weights[:, None, :], att_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]
    sums = (
        jnp.dot(xh, wxh_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(z, wz_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    )
    sig = jax.nn.sigmoid(sums[:, : 3 * rnn_size])
    in_gate = sig[:, :rnn_size]
    forget_gate = sig[:, rnn_size : 2 * rnn_size]
    out_gate = sig[:, 2 * rnn_size : 3 * rnn_size]
    g = jnp.tanh(sums[:, 3 * rnn_size : 4 * rnn_size])
    c_new = forget_gate * c_ref[:].astype(jnp.float32) + in_gate * g
    h_new = out_gate * jnp.tanh(c_new)
    # outputs follow the input state dtype (bf16 decode keeps a bf16 carry)
    h_out_ref[:] = h_new.astype(h_out_ref.dtype)
    c_out_ref[:] = c_new.astype(c_out_ref.dtype)


def _pick_tile(B: int, A: int, D: int) -> int:
    """Largest batch tile whose att slab fits a conservative VMEM budget."""
    budget = 6 * 1024 * 1024  # bytes for the (TB, A, D) feature slab
    tb = max(1, budget // max(A * D * 4, 1))
    tb = min(tb, B)
    while B % tb:
        tb -= 1
    return tb


@functools.partial(jax.jit, static_argnames=("rnn_size", "interpret"))
def fused_att_lstm_step(
    xt, h, c, att_feats, keys, att_params, wxh, wz, gate_bias, *,
    rnn_size: int, interpret: bool = False,
):
    """Pallas-fused equivalent of cells.att_lstm_step (no dropout, no maxout).

    att_params: the attention param dict (h_2_att_h / att_h_2_out weights).
    wxh: (E+R, 4R) concatenated [i2h; h2h] weight. wz: (D, 4R).
    gate_bias: (4R,) = bi + bh + bz summed.
    Returns (h', c').
    """
    B, A, D = att_feats.shape
    H = keys.shape[-1]
    G = wxh.shape[-1]
    xh = jnp.concatenate([xt, h], axis=1)
    TB = _pick_tile(B, A, D)
    grid = (B // TB,)

    row_spec = lambda width: pl.BlockSpec(
        (TB, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full_spec = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    h_new, c_new = pl.pallas_call(
        functools.partial(_kernel, rnn_size=rnn_size),
        grid=grid,
        in_specs=[
            row_spec(xh.shape[1]),
            row_spec(rnn_size),
            pl.BlockSpec((TB, A, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, A, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full_spec(rnn_size, H),
            full_spec(H),
            full_spec(H, 1),
            full_spec(1),
            full_spec(xh.shape[1], G),
            full_spec(D, G),
            full_spec(G),
        ],
        out_specs=[row_spec(rnn_size), row_spec(rnn_size)],
        out_shape=[
            jax.ShapeDtypeStruct((B, rnn_size), h.dtype),
            jax.ShapeDtypeStruct((B, rnn_size), h.dtype),
        ],
        interpret=interpret,
    )(
        xh,
        c,
        att_feats,
        keys,
        att_params["h_2_att_h"]["w"],
        att_params["h_2_att_h"]["b"],
        att_params["att_h_2_out"]["w"],
        att_params["att_h_2_out"]["b"],
        wxh,
        wz,
        gate_bias,
    )
    return h_new, c_new


def pack_att_lstm_params(params):
    """Precompute the fused-kernel weight layout from att_lstm params:
    (wxh, wz, gate_bias). Do this once per decode, outside the step loop."""
    wxh = jnp.concatenate([params["i2h"]["w"], params["h2h"]["w"]], axis=0)
    gate_bias = params["i2h"]["b"] + params["h2h"]["b"] + params["z2h"]["b"]
    return wxh, params["z2h"]["w"], gate_bias
