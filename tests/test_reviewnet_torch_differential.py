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

    # torch spec: fc2h init, 3 untied review steps, reason max-pool, decoder
    R = model.rnn_size
    h = t_linear(params["fc2h"], t(fc))
    c = h.clone()
    thoughts, reasons = [], []
    sel = lambda tree, s: jax.tree_util.tree_map(lambda x: np.asarray(x[s]), tree)
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
    seq_t = torch.from_numpy(seq)
    for i in range(model.seq_length + 1):
        xt = t(params["embed"])[seq_t[:, i]]
        z = t_attend(dec["att"], h, mem)
        sums = (
            t_linear(dec["i2h"], xt) + t_linear(dec["h2h"], h)
            + t_linear(dec["z2h"], z)
        )
        h, c = t_gates(sums, c, R)
        outs.append(t_mos(params["mos"], h))
    lps_t = torch.stack(outs, 1)

    np.testing.assert_allclose(np.asarray(lps), lps_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(reason[0]), reason_t.numpy(), rtol=1e-4, atol=1e-5)
