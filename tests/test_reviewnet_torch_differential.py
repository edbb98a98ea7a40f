"""Full-model differential test for ReviewNet WITH the Mixture-of-Softmax
head: the forward pass re-stated independently in float64 PyTorch from the
reference's equations (misc/ReviewNetModel.py:73-128 with the intended
review-cell semantics, misc/MixtureOfSoftmax.py:23-34), run with OUR
parameters, compared against our JAX forward."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from recurrent_fusion_network_tpu.models import ReviewNetModel

import pytest


@pytest.fixture(autouse=True)
def _torch_f64():
    # float64 reference math, scoped per test: a module-level
    # set_default_dtype leaks into every OTHER test module at collection
    # time (it broke the resnet golden test's torch net construction)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


def t(x):
    if isinstance(x, torch.Tensor):  # pass through (grad-carrying params)
        return x
    return torch.from_numpy(np.asarray(x, dtype=np.float64))


def t_linear(p, x):
    y = x @ t(p["w"])
    if "b" in p:
        y = y + t(p["b"])
    return y


def t_attend(p, h, att):
    keys = t_linear(p["att_2_att_h"], att)
    q = t_linear(p["h_2_att_h"], h)
    scores = torch.tanh(keys + q.unsqueeze(1))
    scores = t_linear(p["att_h_2_out"], scores).squeeze(-1)
    w = torch.softmax(scores, dim=-1)
    return torch.einsum("ba,bad->bd", w, att)


def t_gates(sums, c_prev, R):
    sig = torch.sigmoid(sums[:, : 3 * R])
    i, f, o = sig[:, :R], sig[:, R : 2 * R], sig[:, 2 * R : 3 * R]
    g = torch.tanh(sums[:, 3 * R : 4 * R])
    c = f * c_prev + i * g
    return o * torch.tanh(c), c


def t_mos(p, out, eps=1e-12):
    """MixtureOfSoftmax (misc/MixtureOfSoftmax.py:23-34)."""
    prior = torch.softmax(out @ t(p["prior"]["w"]), dim=1)
    total = None
    E = p["latent"]["w"].shape[0]
    for e in range(E):
        lat = torch.tanh(out @ t(p["latent"]["w"][e]) + t(p["latent"]["b"][e]))
        prob = torch.softmax(
            lat @ t(p["decoder"]["w"]) + t(p["decoder"]["b"]), dim=1
        ) * prior[:, e].unsqueeze(1)
        total = prob if total is None else total + prob
    return torch.log(total + eps)


def torch_reviewnet_forward(model, params, fc, att, seq):
    """Reference-equation ReviewNet forward in torch (float64): fc2h init,
    untied review steps, reason max-pool, decoder over thought vectors,
    MoS or log-softmax head."""
    R = model.rnn_size
    h = t_linear(params["fc2h"], t(fc))
    c = h.clone()
    thoughts, reasons = [], []
    sel = lambda tree, s: jax.tree_util.tree_map(lambda x: t(x)[s], tree)
    for s in range(model.num_review_steps):
        cell = sel(params["review"], s)
        z = t_attend(cell["att"], h, t(att))
        sums = t_linear(cell["h2h"], h) + t_linear(cell["z2h"], z)
        h, c = t_gates(sums, c, R)
        thoughts.append(h)
        reasons.append(t_linear(params["reason_linear"], h))
    reason_t = torch.stack(reasons, 1).max(1).values
    mem = torch.stack(thoughts, 1)

    dec = params["decoder"]
    outs = []
    seq_t = torch.from_numpy(np.asarray(seq))
    for i in range(model.seq_length + 1):
        xt = t(params["embed"])[seq_t[:, i]]
        z = t_attend(dec["att"], h, mem)
        sums = (
            t_linear(dec["i2h"], xt) + t_linear(dec["h2h"], h)
            + t_linear(dec["z2h"], z)
        )
        h, c = t_gates(sums, c, R)
        if model.use_mos:
            outs.append(t_mos(params["mos"], h))
        else:
            outs.append(torch.log_softmax(t_linear(params["logit"], h), dim=-1))
    return torch.stack(outs, 1), reason_t


def test_reviewnet_mos_forward_matches_torch_spec():
    model = ReviewNetModel(
        vocab_size=14, seq_length=5, input_encoding_size=8, rnn_size=8,
        att_hid_size=8, fc_feat_size=7, att_feat_size=6, att_num=4,
        num_review_steps=3, top_words_count=5, use_mos=True, num_expert=3,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    g = np.random.default_rng(0)
    B = 3
    fc = g.standard_normal((B, 7)).astype(np.float32)
    att = g.standard_normal((B, 4, 6)).astype(np.float32)
    seq = np.zeros((B, 7), np.int64)
    seq[:, 1:6] = g.integers(1, 15, (B, 5))

    lps, reason = model.forward(
        params, jnp.asarray(fc), jnp.asarray(att), jnp.asarray(seq)
    )
    lps_t, reason_t = torch_reviewnet_forward(model, params, fc, att, seq)

    np.testing.assert_allclose(np.asarray(lps), lps_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(reason[0]), reason_t.numpy(), rtol=1e-4, atol=1e-5)


def test_reviewnet_xe_step_loss_and_grads_match_torch():
    """ReviewNet XE step: forward x ReviewNetCriterion (XE + single-head
    MultiLabelMargin, misc/utils.py:212-249) — loss AND every gradient leaf
    vs torch autograd (completes the per-model grad-step trio)."""
    from recurrent_fusion_network_tpu.config import Options
    from recurrent_fusion_network_tpu.training.criterion import make_criterion

    model = ReviewNetModel(
        vocab_size=14, seq_length=5, input_encoding_size=8, rnn_size=8,
        att_hid_size=8, fc_feat_size=7, att_feat_size=6, att_num=4,
        num_review_steps=3, top_words_count=5,
    )
    params = model.init_params(jax.random.PRNGKey(1))
    g = np.random.default_rng(6)
    B = 3
    fc = g.standard_normal((B, 7)).astype(np.float32)
    att = g.standard_normal((B, 4, 6)).astype(np.float32)
    labels = np.zeros((B, 7), np.int64)
    labels[:, 1:5] = g.integers(1, 15, (B, 4))
    labels[1, 3:] = 0  # early-EOS row
    masks = np.zeros((B, 7), np.float32)
    for r in range(B):
        masks[r, : int((labels[r] != 0).sum()) + 2] = 1.0
    top_words = np.full((B, 5), -1, np.int64)
    top_words[:, :2] = g.integers(0, 5, (B, 2))

    opt = Options(caption_model="review_net", reason_weight=0.4,
                  use_label_smoothing=0)
    opt.vocab_size = model.vocab_size
    opt.seq_length = model.seq_length
    crit = make_criterion(opt)

    def loss_fn(p):
        lps, reason = model.forward(p, jnp.asarray(fc), jnp.asarray(att),
                                    jnp.asarray(labels))
        return crit(lps, jnp.asarray(labels), jnp.asarray(masks), reason,
                    jnp.asarray(top_words))

    loss_jax, grads_jax = jax.value_and_grad(loss_fn)(params)

    tparams = jax.tree_util.tree_map(
        lambda x: torch.tensor(np.asarray(x, np.float64), requires_grad=True),
        params,
    )
    lps_t, reason_t = torch_reviewnet_forward(model, tparams, fc, att, labels)
    T = lps_t.shape[1]
    target = torch.from_numpy(labels[:, 1 : T + 1])
    mask = torch.from_numpy(masks[:, 1 : T + 1]).to(lps_t.dtype)
    nll = -lps_t.gather(2, target.unsqueeze(-1)).squeeze(-1) * mask
    mlm = torch.nn.MultiLabelMarginLoss()
    loss_t = nll.sum() / B + 0.4 * mlm(reason_t, torch.from_numpy(top_words))
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
    assert len(flat_j) == len(flat_t) > 15
    for (path, gj), gt in zip(flat_j, flat_t):
        np.testing.assert_allclose(
            np.asarray(gj), gt, rtol=2e-3, atol=2e-5,
            err_msg=f"gradient diverges at {jax.tree_util.keystr(path)}",
        )
