"""Full-model differential test for ShowTellModel vs a torch restatement.

Completes the per-model trio (ReviewNet and RFNet already have full-forward
torch differential tests): the reference ShowTell forward
(misc/ShowTellModel.py:40-93) — img fc embed as step-0 input to a bias-free
stacked LSTM whose step-0 output is dropped, then teacher-forced token steps
through the shared logit head — restated in float64 torch with OUR parameter
convention, compared logit-for-logit, plus the composed XE loss and every
parameter gradient (the same end-to-end pin as
test_xe_step_torch_differential for RFNet).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from recurrent_fusion_network_tpu.models import ShowTellModel

from test_rfnet_torch_differential import _torch_f64, t, t_gates  # noqa: F401


def torch_showtell_forward(model, params, fc, seq):
    """Reference-equation ShowTell forward in torch (float64)."""
    R = model.rnn_size
    fc = t(fc)
    seq = torch.from_numpy(np.asarray(seq))
    B = fc.shape[0]

    def core(xt, state):
        new_state = []
        h = xt
        for layer, (ph, pc) in zip(params["core"], state):
            sums = h @ t(layer["i2h"]["w"]) + ph @ t(layer["h2h"]["w"])
            h, c = t_gates(sums, pc, R)
            new_state.append((h, c))
        return h, new_state

    zero = torch.zeros((B, R), dtype=torch.float64)
    state = [(zero, zero) for _ in range(model.num_layers)]
    # image step (output dropped, misc/ShowTellModel.py:79)
    xt = fc @ t(params["img_embed"]["w"]) + t(params["img_embed"]["b"])
    _, state = core(xt, state)

    outs = []
    for i in range(model.seq_length + 1):
        xt = t(params["embed"])[seq[:, i]]
        h, state = core(xt, state)
        logits = h @ t(params["logit"]["w"]) + t(params["logit"]["b"])
        outs.append(torch.log_softmax(logits, dim=-1))
    return torch.stack(outs, 1)


def test_showtell_full_forward_and_grads_match_torch():
    from recurrent_fusion_network_tpu.config import Options
    from recurrent_fusion_network_tpu.training.criterion import make_criterion

    model = ShowTellModel(
        vocab_size=14, seq_length=6, input_encoding_size=10, rnn_size=9,
        num_layers=2, fc_feat_size=8,
    )
    params = model.init_params(jax.random.PRNGKey(3))
    g = np.random.default_rng(4)
    B = 3
    fc = g.standard_normal((B, model.fc_feat_size)).astype(np.float32)
    labels = np.zeros((B, model.seq_length + 2), np.int64)
    labels[:, 1:6] = g.integers(1, 15, (B, 5))
    labels[1, 4:] = 0  # an early-ending row
    masks = np.zeros((B, model.seq_length + 2), np.float32)
    for r in range(B):
        masks[r, : int((labels[r] != 0).sum()) + 2] = 1.0

    # logits
    lps, _ = model.forward(params, jnp.asarray(fc), None, jnp.asarray(labels))
    lps_t = torch_showtell_forward(model, params, fc, labels)
    np.testing.assert_allclose(
        np.asarray(lps), lps_t.detach().numpy(), rtol=1e-4, atol=1e-5,
        err_msg="ShowTell full-forward log-probs diverge from the torch spec",
    )

    # composed XE loss + grads at every leaf
    opt = Options(caption_model="show_tell", use_label_smoothing=0)
    opt.vocab_size = model.vocab_size
    opt.seq_length = model.seq_length
    crit = make_criterion(opt)

    def loss_fn(p):
        lp, reason = model.forward(p, jnp.asarray(fc), None, jnp.asarray(labels))
        return crit(lp, jnp.asarray(labels), jnp.asarray(masks), reason, None)

    loss_jax, grads_jax = jax.value_and_grad(loss_fn)(params)

    tparams = jax.tree_util.tree_map(
        lambda x: torch.tensor(np.asarray(x, np.float64), requires_grad=True),
        params,
    )
    lps_t = torch_showtell_forward(model, tparams, fc, labels)
    T = lps_t.shape[1]
    target = torch.from_numpy(labels[:, 1 : T + 1])
    mask = torch.from_numpy(masks[:, 1 : T + 1]).to(lps_t.dtype)
    nll = -lps_t.gather(2, target.unsqueeze(-1)).squeeze(-1) * mask
    loss_t = nll.sum() / B
    loss_t.backward()

    np.testing.assert_allclose(float(loss_jax), loss_t.item(), rtol=1e-5)
    flat_j = jax.tree_util.tree_flatten_with_path(grads_jax)[0]
    flat_t = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(
            lambda x: np.zeros_like(np.asarray(x.detach()))
            if x.grad is None else x.grad.numpy(),
            tparams,
        )
    )[0]
    assert len(flat_j) == len(flat_t) >= 8
    for (path, gj), gt in zip(flat_j, flat_t):
        np.testing.assert_allclose(
            np.asarray(gj), gt, rtol=2e-3, atol=2e-5,
            err_msg=f"gradient diverges at {jax.tree_util.keystr(path)}",
        )
