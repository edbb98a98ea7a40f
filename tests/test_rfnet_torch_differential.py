"""Full-model differential test: the ENTIRE RecurrentFusionModel forward pass
re-stated independently in PyTorch from the reference's equations
(misc/RecurrentFusionModel.py:198-281 + the three cell definitions), run with
OUR parameters, and compared logit-for-logit against our JAX forward.

This pins the composition — fc2h init, stage-I interacting fusion with
per-step untied weights, state averaging, stage-II multi-attention, decoder,
log-softmax head, and all M+1 reason heads — not just the individual cores.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from recurrent_fusion_network_tpu.models import RecurrentFusionModel

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
    """AttentionModelCore math (misc/AttentionModelCore.py:31-48)."""
    keys = t_linear(p["att_2_att_h"], att)  # (B, A, H)
    q = t_linear(p["h_2_att_h"], h)  # (B, H)
    scores = torch.tanh(keys + q.unsqueeze(1))
    scores = t_linear(p["att_h_2_out"], scores).squeeze(-1)  # (B, A)
    w = torch.softmax(scores, dim=-1)
    return torch.einsum("ba,bad->bd", w, att)


def t_gates(sums, c_prev, R):
    sig = torch.sigmoid(sums[:, : 3 * R])
    i, f, o = sig[:, :R], sig[:, R : 2 * R], sig[:, 2 * R : 3 * R]
    g = torch.tanh(sums[:, 3 * R : 4 * R])
    c = f * c_prev + i * g
    h = o * torch.tanh(c)
    return h, c


def torch_rfnet_forward(model, params, fcs, atts, seq):
    """Reference-equation RFNet forward in torch (float64)."""
    M, R = model.num_feat_array, model.rnn_size
    B = fcs[0].shape[0]
    fcs = [t(x) for x in fcs]
    atts = [t(x) for x in atts]
    seq = torch.from_numpy(np.asarray(seq))

    # fc -> init states (RecurrentFusionModel.py:202-208)
    states = []
    for j in range(M):
        h = t_linear(params["fc2h"][j], fcs[j])
        states.append((h, h.clone()))

    # stage I (RecurrentFusionModel.py:213-231)
    sel = lambda tree, s: jax.tree_util.tree_map(lambda x: t(x)[s], tree)
    thoughts = [[] for _ in range(M)]
    reasons = [[] for _ in range(M)]
    for s in range(model.num_review_steps_0):
        H = torch.cat([st[0] for st in states], dim=1)
        new_states = []
        for j in range(M):
            cell = sel(params["review1"][j], s)
            z = t_attend(cell["att"], states[j][0], atts[j])
            sums = t_linear(cell["H2h"], H) + t_linear(cell["z2h"], z)
            h, c = t_gates(sums, states[j][1], R)
            new_states.append((h, c))
            thoughts[j].append(h)
            reasons[j].append(t_linear(params["reason_individual"][j], h))
        states = new_states

    reason_preds = [torch.stack(r, 1).max(1).values for r in reasons]
    thought_mats = [torch.stack(ts, 1) for ts in thoughts]  # M x (B, R0, R)

    # state average (RecurrentFusionModel.py:233-237)
    h = sum(st[0] for st in states) / M
    c = sum(st[1] for st in states) / M

    # stage II (RecurrentFusionModel.py:239-255)
    comb_thoughts, comb_reasons = [], []
    for s in range(model.num_review_steps):
        cell = sel(params["review2"], s)
        sums = t_linear(cell["h2h"], h)
        for m in range(M):
            att_m = {k: {kk: vv[m] for kk, vv in v.items()} for k, v in cell["att"].items()}
            z = t_attend(att_m, h, thought_mats[m])
            sums = sums + z @ t(cell["z_2_h"]["w"][m]) + t(cell["z_2_h"]["b"][m])
        h, c = t_gates(sums, c, R)
        comb_thoughts.append(h)
        comb_reasons.append(t_linear(params["reason_linear"], h))
    reason_preds.append(torch.stack(comb_reasons, 1).max(1).values)
    comb = torch.stack(comb_thoughts, 1)  # (B, S, R)

    # decoder (RecurrentFusionModel.py:257-281): inputs seq[:, :L+1]
    dec = params["decoder"]
    outs = []
    for i in range(model.seq_length + 1):
        it = seq[:, i]
        xt = t(params["embed"])[it]
        z = t_attend(dec["att"], h, comb)
        sums = (
            t_linear(dec["i2h"], xt)
            + t_linear(dec["h2h"], h)
            + t_linear(dec["z2h"], z)
        )
        h, c = t_gates(sums, c, R)
        logits = t_linear(params["logit"], h)
        outs.append(torch.log_softmax(logits, dim=-1))
    return torch.stack(outs, 1), reason_preds


def test_full_forward_matches_torch_spec():
    model = RecurrentFusionModel(
        vocab_size=12, seq_length=5,
        fc_feat_sizes=(7, 5), att_feat_sizes=(9, 6), att_nums=(4, 3),
        input_encoding_size=8, rnn_size=8, att_hid_size=8,
        num_review_steps=2, num_review_steps_0=3, top_words_count=6,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    g = np.random.default_rng(0)
    B = 3
    fcs = [g.standard_normal((B, d)).astype(np.float32) for d in model.fc_feat_sizes]
    atts = [g.standard_normal((B, n, d)).astype(np.float32)
            for n, d in zip(model.att_nums, model.att_feat_sizes)]
    seq = np.zeros((B, model.seq_length + 2), np.int64)
    seq[:, 1:6] = g.integers(1, 13, (B, 5))

    lps, reason = model.forward(
        params, [jnp.asarray(f) for f in fcs], [jnp.asarray(a) for a in atts],
        jnp.asarray(seq),
    )
    lps_t, reason_t = torch_rfnet_forward(model, params, fcs, atts, seq)

    np.testing.assert_allclose(
        np.asarray(lps), lps_t.numpy(), rtol=1e-4, atol=1e-5,
        err_msg="full-forward log-probs diverge from the torch spec",
    )
    assert len(reason) == len(reason_t) == 3
    for r_jax, r_torch in zip(reason, reason_t):
        np.testing.assert_allclose(
            np.asarray(r_jax), r_torch.numpy(), rtol=1e-4, atol=1e-5
        )
