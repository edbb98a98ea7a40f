"""Golden-value parity tests for the ops layer against PyTorch reference math.

The torch computations below re-state the reference cells' equations
(misc/AttentionModelCore.py:31-48, misc/LSTMSoftAttentionCore.py:60-102,
misc/utils.py criterions) independently, so our JAX ops are validated against
an executable spec rather than against themselves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick
import torch
import torch.nn.functional as F

from recurrent_fusion_network_tpu.ops import attention, cells, losses, mos
from recurrent_fusion_network_tpu.ops.initializers import apply_linear

B, A, D, R, H = 4, 7, 12, 10, 9


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def torch_attend(params, h, att):
    """Reference attention math in torch."""
    wa, ba = t(params["att_2_att_h"]["w"]), t(params["att_2_att_h"]["b"])
    wh, bh = t(params["h_2_att_h"]["w"]), t(params["h_2_att_h"]["b"])
    wv, bv = t(params["att_h_2_out"]["w"]), t(params["att_h_2_out"]["b"])
    att_linear = att.reshape(-1, att.shape[-1]) @ wa + ba
    att_linear = att_linear.view(att.shape[0], att.shape[1], -1)
    h_linear = h @ wh + bh
    att_h = torch.tanh(h_linear.unsqueeze(1) + att_linear)
    scores = (att_h.reshape(-1, att_h.shape[-1]) @ wv + bv).view(att.shape[0], att.shape[1])
    w = torch.softmax(scores, dim=1)
    z = torch.bmm(att.transpose(1, 2), w.unsqueeze(2)).squeeze(2)
    return z


def torch_lstm_update(sums, pre_c, rnn_size, maxout=False):
    sig = torch.sigmoid(sums[:, : 3 * rnn_size])
    i, f, o = sig[:, :rnn_size], sig[:, rnn_size : 2 * rnn_size], sig[:, 2 * rnn_size :]
    if maxout:
        g = torch.max(sums[:, 3 * rnn_size : 4 * rnn_size], sums[:, 4 * rnn_size : 5 * rnn_size])
    else:
        g = torch.tanh(sums[:, 3 * rnn_size : 4 * rnn_size])
    c = f * pre_c + i * g
    h = o * torch.tanh(c)
    return h, c


class TestAttention:
    def test_parity_with_torch(self, rng):
        key = jax.random.PRNGKey(0)
        params = attention.init(key, R, D, H)
        h = rng.standard_normal((B, R)).astype(np.float32)
        att = rng.standard_normal((B, A, D)).astype(np.float32)
        z, w = attention.attend(params, jnp.asarray(h), jnp.asarray(att))
        z_t = torch_attend(params, t(h), t(att))
        np.testing.assert_allclose(np.asarray(z), z_t.numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), np.ones(B), rtol=1e-5)

    def test_precomputed_keys_equivalent(self, rng):
        key = jax.random.PRNGKey(1)
        params = attention.init(key, R, D, H)
        h = jnp.asarray(rng.standard_normal((B, R)), jnp.float32)
        att = jnp.asarray(rng.standard_normal((B, A, D)), jnp.float32)
        keys = attention.precompute_keys(params, att)
        z1, _ = attention.attend(params, h, att)
        z2, _ = attention.attend(params, h, att, keys=keys)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-6)

    def test_mask_excludes_positions(self, rng):
        key = jax.random.PRNGKey(2)
        params = attention.init(key, R, D, H)
        h = jnp.asarray(rng.standard_normal((B, R)), jnp.float32)
        att = jnp.asarray(rng.standard_normal((B, A, D)), jnp.float32)
        mask = jnp.asarray([True] * 4 + [False] * (A - 4))
        _, w = attention.attend(params, h, att, mask=mask)
        assert np.all(np.asarray(w[:, 4:]) < 1e-6)
        # masked attention over the valid prefix == unmasked attention on it
        z_sub, _ = attention.attend(params, h, att[:, :4])
        z_m, _ = attention.attend(params, h, att, mask=mask)
        # contexts differ only through masked features' weights (≈0)
        np.testing.assert_allclose(np.asarray(z_m), np.asarray(z_sub), atol=1e-4)


class TestCells:
    def test_att_lstm_step_parity(self, rng):
        key = jax.random.PRNGKey(3)
        E = 8
        params = cells.att_lstm_init(key, E, R, D, H)
        xt = rng.standard_normal((B, E)).astype(np.float32)
        att = rng.standard_normal((B, A, D)).astype(np.float32)
        h0 = rng.standard_normal((B, R)).astype(np.float32)
        c0 = rng.standard_normal((B, R)).astype(np.float32)
        out, (h1, c1) = cells.att_lstm_step(
            params, jnp.asarray(xt), jnp.asarray(att), (jnp.asarray(h0), jnp.asarray(c0)),
            rnn_size=R,
        )
        # torch spec
        z = torch_attend(params["att"], t(h0), t(att))
        sums = (
            t(xt) @ t(params["i2h"]["w"]) + t(params["i2h"]["b"])
            + t(h0) @ t(params["h2h"]["w"]) + t(params["h2h"]["b"])
            + z @ t(params["z2h"]["w"]) + t(params["z2h"]["b"])
        )
        h_t, c_t = torch_lstm_update(sums, t(c0), R)
        np.testing.assert_allclose(np.asarray(h1), h_t.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c1), c_t.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(h1))

    def test_maxout_variant(self, rng):
        key = jax.random.PRNGKey(4)
        E = 8
        params = cells.att_lstm_init(key, E, R, D, H, maxout=True)
        assert params["i2h"]["w"].shape == (E, 5 * R)
        xt = jnp.asarray(rng.standard_normal((B, E)), jnp.float32)
        att = jnp.asarray(rng.standard_normal((B, A, D)), jnp.float32)
        st = (jnp.zeros((B, R)), jnp.zeros((B, R)))
        out, _ = cells.att_lstm_step(params, xt, att, st, rnn_size=R, maxout=True)
        assert out.shape == (B, R)

    def test_no_input_lstm_bias_fills(self):
        params = cells.no_input_lstm_init(jax.random.PRNGKey(5), R, D, H)
        np.testing.assert_allclose(np.asarray(params["h2h"]["b"]), -1.0)
        np.testing.assert_allclose(np.asarray(params["att"]["h_2_att_h"]["b"]), 0.0)

    def test_multi_att_init_map_matches_reference(self):
        """The reference re-initializes ONLY h2h in the multi-attention
        cell (LSTMSoftMultiAttentionFeatArrayNoInputCore.py:36-38): z_2_h
        keeps torch's nn.Linear default U(-1/sqrt(fan_in)). With D=512 the
        default bound (0.0442) is well under the 0.1 of the uniform init —
        a z_2_h drawn U(-0.1,0.1) is 2.3x too wide and shifts training
        dynamics from step 0 (review r3; the torch differentials inject our
        params, so they can never catch init mismatches)."""
        D_big = 512
        params = cells.multi_att_lstm_init(jax.random.PRNGKey(8), R, D_big, 3, H)
        bound = 1.0 / np.sqrt(D_big)
        z_w = np.asarray(params["z_2_h"]["w"])
        assert np.abs(z_w).max() <= bound + 1e-7, (
            f"z_2_h weight {np.abs(z_w).max():.4f} exceeds the torch "
            f"default bound {bound:.4f}"
        )
        h_w = np.asarray(params["h2h"]["w"])
        assert np.abs(h_w).max() <= 0.1 + 1e-7
        assert np.abs(h_w).max() > bound  # really U(-0.1,0.1), not default

    def test_multi_att_matches_loop(self, rng):
        M = 3
        key = jax.random.PRNGKey(6)
        params = cells.multi_att_lstm_init(key, R, D, M, H)
        att_stack = jnp.asarray(rng.standard_normal((M, B, A, D)), jnp.float32)
        h0 = jnp.asarray(rng.standard_normal((B, R)), jnp.float32)
        c0 = jnp.asarray(rng.standard_normal((B, R)), jnp.float32)
        out, (h1, c1) = cells.multi_att_lstm_step(
            params, att_stack, (h0, c0), rnn_size=R
        )
        # loop spec
        sums = apply_linear(params["h2h"], h0)
        for i in range(M):
            att_i = jax.tree_util.tree_map(lambda x: x[i], params["att"])
            z, _ = attention.attend(att_i, h0, att_stack[i])
            z2h_i = jax.tree_util.tree_map(lambda x: x[i], params["z_2_h"])
            sums = sums + apply_linear(z2h_i, z)
        h_ref, c_ref = cells.lstm_update(sums, c0, R, maxout=False)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h_ref), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c_ref), rtol=1e-4, atol=1e-5)

    def test_dropout_train_vs_eval(self, rng):
        key = jax.random.PRNGKey(7)
        params = cells.no_input_lstm_init(key, R, D, H)
        att = jnp.asarray(rng.standard_normal((B, A, D)), jnp.float32)
        st = (jnp.zeros((B, R)), jnp.zeros((B, R)))
        out_d, _ = cells.no_input_lstm_step(params, att, st, rnn_size=R)
        out_t, (h_t, _) = cells.no_input_lstm_step(
            params, att, st, rnn_size=R, drop_rate=0.5,
            rng=jax.random.PRNGKey(8), deterministic=False,
        )
        assert not np.allclose(np.asarray(out_d), np.asarray(out_t))
        # dropout is applied to the carried h too (reference behavior)
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(h_t))


class TestMoS:
    def test_parity_with_torch_loop(self, rng):
        E_rnn, emb, n_exp, V = 10, 6, 4, 20
        params = mos.init(jax.random.PRNGKey(9), E_rnn, emb, n_exp, V)
        x = rng.standard_normal((B, E_rnn)).astype(np.float32)
        probs = mos.apply(params, jnp.asarray(x))
        # torch loop spec (misc/MixtureOfSoftmax.py:23-34)
        xt = t(x)
        prior = torch.softmax(xt @ t(params["prior"]["w"]), dim=1)
        total = torch.zeros(B, V)
        for i in range(n_exp):
            lat = torch.tanh(xt @ t(params["latent"]["w"][i]) + t(params["latent"]["b"][i]))
            p = torch.softmax(lat @ t(params["decoder"]["w"]) + t(params["decoder"]["b"]), dim=1)
            total = total + p * prior[:, i].unsqueeze(1)
        np.testing.assert_allclose(np.asarray(probs), total.numpy(), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1)), np.ones(B), rtol=1e-5)


class TestLosses:
    def test_language_model_loss_vs_torch(self, rng):
        T, V = 5, 11
        lp = np.log(rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32))
        target = rng.integers(0, V, (B, T + 2))
        mask = (rng.random((B, T + 2)) > 0.3).astype(np.float32)
        got = losses.language_model_loss(jnp.asarray(lp), jnp.asarray(target), jnp.asarray(mask))
        # torch spec (misc/utils.py:277-282)
        lp_t = t(lp).reshape(-1, V)
        tg = torch.from_numpy(target[:, :T]).reshape(-1, 1)
        mk = t(mask[:, :T]).reshape(-1, 1)
        want = torch.sum(-lp_t.gather(1, tg) * mk) / B
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_label_smoothing_vs_torch(self, rng):
        T, V = 4, 9
        eps = 0.1
        lp = np.log(rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32))
        target = rng.integers(0, V, (B, T))
        mask = np.ones((B, T), np.float32)
        got = losses.language_model_loss(
            jnp.asarray(lp), jnp.asarray(target), jnp.asarray(mask),
            use_label_smoothing=True, label_smoothing_epsilon=eps,
        )
        one_hot = torch.zeros(B, T, V).scatter_(2, torch.from_numpy(target).unsqueeze(2), 1.0)
        one_hot = one_hot * (1 - eps) + eps / V
        want = torch.sum(-torch.sum(t(lp) * one_hot, 2) * t(mask)) / B
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_multilabel_margin_vs_torch(self, seed):
        g = np.random.default_rng(seed)
        C = 15
        x = g.standard_normal((B, C)).astype(np.float32)
        y = np.full((B, C), -1, dtype=np.int64)
        for b in range(B):
            k = g.integers(1, 6)
            y[b, :k] = g.choice(C, size=k, replace=False)
        got = losses.multilabel_margin_loss(jnp.asarray(x), jnp.asarray(y))
        want = torch.nn.MultiLabelMarginLoss()(t(x), torch.from_numpy(y))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_multilabel_margin_max_targets_truncation(self):
        g = np.random.default_rng(3)
        C = 20
        x = g.standard_normal((B, C)).astype(np.float32)
        y = np.full((B, C), -1, dtype=np.int64)
        for b in range(B):
            y[b, :4] = g.choice(C, size=4, replace=False)
        full = losses.multilabel_margin_loss(jnp.asarray(x), jnp.asarray(y))
        trunc = losses.multilabel_margin_loss(jnp.asarray(x), jnp.asarray(y), max_targets=8)
        np.testing.assert_allclose(float(full), float(trunc), rtol=1e-6)

    def test_reward_loss_vs_torch(self, rng):
        T, V = 6, 8
        slp = -np.abs(rng.standard_normal((B, T))).astype(np.float32)
        seq = rng.integers(0, 3, (B, T))
        seq[:, 0] = 1  # first token alive
        reward = rng.standard_normal((B, T)).astype(np.float32)
        lpa = np.log(rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32))
        ent_reg = 0.01
        got = losses.reward_loss(
            jnp.asarray(slp), jnp.asarray(seq), jnp.asarray(reward),
            jnp.asarray(lpa), ent_reg,
        )
        # torch spec (misc/utils.py:93-118)
        mask0 = (torch.from_numpy(seq) > 0).float()
        mask = torch.cat([torch.ones(B, 1), mask0[:, :-1]], 1)
        out = -t(slp) * t(reward) * mask
        ent = torch.sum(t(lpa) * torch.exp(t(lpa)), 2) * mask0
        want = torch.sum(out) / B + ent_reg * torch.sum(ent) / B
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_ppo_clip_path(self, rng):
        T, V = 5, 7
        slp = -np.abs(rng.standard_normal((B, T))).astype(np.float32)
        slp_old = slp + 0.3 * rng.standard_normal((B, T)).astype(np.float32)
        seq = rng.integers(0, 3, (B, T))
        reward = rng.standard_normal((B, T)).astype(np.float32)
        lpa = np.log(rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32))
        got = losses.reward_loss(
            jnp.asarray(slp), jnp.asarray(seq), jnp.asarray(reward),
            jnp.asarray(lpa), 0.0, jnp.asarray(slp_old),
            use_ppo=True, ppo_clip=0.2,
        )
        mask0 = (torch.from_numpy(seq) > 0).float()
        mask = torch.cat([torch.ones(B, 1), mask0[:, :-1]], 1)
        ratio = torch.exp(t(slp)) / (1e-5 + torch.exp(t(slp_old)))
        surr1 = ratio * t(reward)
        surr2 = ratio.clamp(0.8, 1.2) * t(reward)
        want = torch.sum(-torch.min(surr1, surr2) * mask) / B
        np.testing.assert_allclose(float(got), float(want), rtol=1e-4)

    def test_losses_differentiable(self, rng):
        T, V = 4, 6
        lp = jnp.asarray(np.log(rng.dirichlet(np.ones(V), size=(B, T)).astype(np.float32)))
        target = jnp.asarray(rng.integers(0, V, (B, T)))
        mask = jnp.ones((B, T))
        g = jax.grad(lambda p: losses.language_model_loss(p, target, mask))(lp)
        assert np.isfinite(np.asarray(g)).all()
