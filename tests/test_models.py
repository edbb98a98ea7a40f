"""Model-layer tests: shapes, normalization, determinism, and trainability
of ShowTell / ReviewNet / RecurrentFusionModel."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from recurrent_fusion_network_tpu.config import Options
from recurrent_fusion_network_tpu.models import (
    RecurrentFusionModel,
    ReviewNetModel,
    ShowTellModel,
    setup,
)
from recurrent_fusion_network_tpu.ops import losses

B, V, L = 4, 30, 5


def tiny_showtell():
    m = ShowTellModel(vocab_size=V, seq_length=L, input_encoding_size=12,
                      rnn_size=12, fc_feat_size=8)
    p = m.init_params(jax.random.PRNGKey(0))
    fc = jax.random.normal(jax.random.PRNGKey(1), (B, 8))
    return m, p, fc, None


def tiny_reviewnet(use_mos=False):
    m = ReviewNetModel(vocab_size=V, seq_length=L, input_encoding_size=12,
                       rnn_size=12, att_hid_size=12, fc_feat_size=8,
                       att_feat_size=10, att_num=6, num_review_steps=3,
                       top_words_count=8, use_mos=use_mos, num_expert=3)
    p = m.init_params(jax.random.PRNGKey(0))
    fc = jax.random.normal(jax.random.PRNGKey(1), (B, 8))
    att = jax.random.normal(jax.random.PRNGKey(2), (B, 6, 10))
    return m, p, fc, att


def tiny_rfnet():
    m = RecurrentFusionModel(
        vocab_size=V, seq_length=L,
        fc_feat_sizes=(8, 6, 7), att_feat_sizes=(10, 9, 5), att_nums=(6, 4, 3),
        input_encoding_size=12, rnn_size=12, att_hid_size=12,
        num_review_steps=3, num_review_steps_0=2, top_words_count=8,
    )
    p = m.init_params(jax.random.PRNGKey(0))
    fcs = [jax.random.normal(jax.random.PRNGKey(10 + i), (B, d))
           for i, d in enumerate(m.fc_feat_sizes)]
    atts = [jax.random.normal(jax.random.PRNGKey(20 + i), (B, n, d))
            for i, (n, d) in enumerate(zip(m.att_nums, m.att_feat_sizes))]
    return m, p, fcs, atts


def labels():
    g = np.random.default_rng(0)
    lab = np.zeros((B, L + 2), dtype=np.int32)
    for b in range(B):
        n = g.integers(2, L + 1)
        lab[b, 1 : 1 + n] = g.integers(1, V + 1, n)
    mask = np.zeros((B, L + 2), np.float32)
    nz = (lab != 0).sum(1) + 2
    for b in range(B):
        mask[b, : nz[b]] = 1
    return jnp.asarray(lab), jnp.asarray(mask)


@pytest.mark.parametrize("maker,n_reason", [
    (tiny_showtell, 0), (tiny_reviewnet, 1), (tiny_rfnet, 4),
])
def test_forward_contract(maker, n_reason):
    m, p, fc, att = maker()
    seq, mask = labels()
    lps, reason = m.forward(p, fc, att, seq)
    assert lps.shape == (B, L + 1, V + 1)
    np.testing.assert_allclose(np.asarray(jnp.exp(lps).sum(-1)), 1.0, rtol=1e-4)
    assert len(reason) == n_reason
    for r in reason:
        assert r.shape[0] == B


def test_forward_deterministic_eval():
    m, p, fcs, atts = tiny_rfnet()
    seq, _ = labels()
    a, _ = m.forward(p, fcs, atts, seq)
    b, _ = m.forward(p, fcs, atts, seq)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scheduled_sampling_changes_path():
    m, p, fcs, atts = tiny_rfnet()
    seq, _ = labels()
    base, _ = m.forward(p, fcs, atts, seq)
    ss, _ = m.forward(p, fcs, atts, seq, ss_prob=1.0,
                      rng=jax.random.PRNGKey(3), deterministic=True)
    assert not np.allclose(np.asarray(base), np.asarray(ss))


def test_mos_head_normalized():
    m, p, fc, att = tiny_reviewnet(use_mos=True)
    seq, _ = labels()
    lps, _ = m.forward(p, fc, att, seq)
    np.testing.assert_allclose(np.asarray(jnp.exp(lps).sum(-1)), 1.0, rtol=1e-3)


@pytest.mark.parametrize("maker", [tiny_showtell, tiny_rfnet])
def test_loss_decreases_under_adam(maker):
    m, p, fc, att = maker()
    seq, mask = labels()
    opt = optax.adam(1e-2)
    opt_state = opt.init(p)

    def loss_fn(p):
        lps, _ = m.forward(p, fc, att, seq)
        return losses.language_model_loss(lps, seq[:, 1:], mask[:, 1:])

    @jax.jit
    def train_step(p, opt_state):
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(p, updates), opt_state, l

    l0 = None
    for i in range(20):
        p, opt_state, l = train_step(p, opt_state)
        if l0 is None:
            l0 = float(l)
    assert float(l) < l0 * 0.8, (l0, float(l))


def test_factory_dispatch():
    feats = [
        {"fc_feat_size": 8, "att_feat_size": 10, "att_num": 6},
        {"fc_feat_size": 6, "att_feat_size": 9, "att_num": 4},
    ]
    opt = Options(caption_model="recurrent_fusion_model", vocab_size=V,
                  seq_length=L, feat_array_info=feats, rnn_size=16,
                  input_encoding_size=16, att_hid_size=16)
    m = setup(opt)
    assert isinstance(m, RecurrentFusionModel)
    assert m.num_feat_array == 2
    opt2 = Options(caption_model="show_tell", vocab_size=V, seq_length=L,
                   feat_array_info=feats)
    assert isinstance(setup(opt2), ShowTellModel)
    with pytest.raises(ValueError):
        setup(Options(caption_model="nope", vocab_size=V, seq_length=L,
                      feat_array_info=feats))


def test_rfnet_grad_flows_to_all_params():
    m, p, fcs, atts = tiny_rfnet()
    seq, mask = labels()

    def loss_fn(p):
        lps, reason = m.forward(p, fcs, atts, seq)
        top_true = jnp.full((B, 8), -1, jnp.int32).at[:, 0].set(1)
        return losses.review_net_ensemble_loss(
            lps, seq[:, 1:], mask[:, 1:], reason, top_true, 1.0
        )

    g = jax.grad(loss_fn)(p)
    flat, _ = jax.tree_util.tree_flatten(g)
    nonzero = sum(float(jnp.abs(x).sum()) > 0 for x in flat)
    assert nonzero / len(flat) > 0.9, f"only {nonzero}/{len(flat)} params got grads"


def test_remat_is_numerically_identical():
    """--use_remat rematerializes scan steps in the backward pass — loss and
    gradients must be bit-for-bit compatible with the non-remat path (it only
    trades recompute FLOPs for activation memory)."""
    import numpy as np

    from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
    from recurrent_fusion_network_tpu.models import setup
    from recurrent_fusion_network_tpu.training.criterion import make_criterion
    from recurrent_fusion_network_tpu.training.eval_split import batch_feats

    opt, loader = synthetic_setup(caption_model="recurrent_fusion_model",
                                  batch_size=4)
    opt.vocab_size, opt.seq_length = loader.vocab_size, loader.seq_length
    m0 = setup(opt)
    opt.use_remat = 1
    m1 = setup(opt)
    assert m1.use_remat and not m0.use_remat
    params = m0.init_params(jax.random.PRNGKey(0))
    crit = make_criterion(opt)
    d = loader.get_batch("train")
    fc, att = batch_feats(d)
    lab = jnp.asarray(d["labels"])
    msk = jnp.asarray(d["masks"])
    tw = jnp.asarray(d["top_words"])

    def loss(m):
        def f(p):
            lps, reason = m.forward(p, fc, att, lab, ss_prob=0.3,
                                    rng=jax.random.PRNGKey(5),
                                    deterministic=False)
            return crit(lps, lab, msk, reason, tw)
        return f

    import dataclasses

    # both remat policies against the no-remat ground truth: "save_ctx"
    # (default — attention contexts/weights saved as backward residuals)
    # and "full" (save-nothing round-2 remat). Remat only changes WHAT the
    # backward recomputes, never the values.
    m_full = dataclasses.replace(m1, remat_policy="full")
    assert m1.remat_policy == "save_ctx"
    l0, g0 = jax.value_and_grad(loss(m0))(params)
    for m in (m1, m_full):
        l1, g1 = jax.value_and_grad(loss(m))(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=1e-6)


def test_ss_cond_gating_matches_ungated_sampling():
    """xe_decode gates the scheduled-sampling draw behind lax.cond(ss > 0)
    so pre-ramp training never pays the per-step (B, V) categorical. The
    gate must be transparent: at ss == 0 outputs equal the tok path, at
    ss > 0 the RNG chain (split unconditionally) makes trajectories
    identical to an ungated where(use_ss, sampled, tok) implementation."""
    import numpy as np

    from recurrent_fusion_network_tpu.models.base import xe_decode

    B, T, V = 4, 5, 11
    rng = jax.random.PRNGKey(3)
    seq = jax.random.randint(rng, (B, T), 0, V + 1)
    emb = jax.random.normal(jax.random.fold_in(rng, 1), (V + 1, 8))
    w = jax.random.normal(jax.random.fold_in(rng, 2), (8, V + 1)) * 0.3

    def dec(xt, state, r):
        lp = jax.nn.log_softmax(xt @ w + state)
        return lp, state + 0.1

    def run(ss):
        return xe_decode(
            dec, lambda t: emb[t], jnp.zeros((B, V + 1)), seq,
            ss_prob=ss, rng=jax.random.PRNGKey(7), vocab_size=V,
        )

    # reference implementation: ungated (always draws, discards via where)
    def run_ungated(ss):
        ssv = jnp.asarray(ss, jnp.float32)
        def step(carry, inp):
            state, prev_lp, r = carry
            tok, t_idx = inp
            r, r_coin, r_samp, r_drop = jax.random.split(r, 4)
            coin = jax.random.uniform(r_coin, (B,)) < ssv
            sampled = jax.random.categorical(r_samp, prev_lp, axis=-1)
            it = jnp.where(jnp.logical_and(t_idx >= 1, coin), sampled, tok)
            lp, state = dec(emb[it], state, r_drop)
            return (state, lp, r), lp
        init = (jnp.zeros((B, V + 1)), jnp.zeros((B, V + 1)),
                jax.random.PRNGKey(7))
        _, lps = jax.lax.scan(step, init, (seq.T, jnp.arange(T)))
        return jnp.transpose(lps, (1, 0, 2))

    for ss in (0.0, 0.7):
        np.testing.assert_array_equal(np.asarray(run(ss)),
                                      np.asarray(run_ungated(ss)))


class TestTiedAttKeys:
    """--tied_att_keys: the TPU-native RFNet variant sharing attention-KEY
    projections across review steps (recurrent_fusion.py docstring; an 8x
    FLOP cut on the measured-dominant encode cost). Off by default."""

    def _tied(self):
        m, _, fcs, atts = tiny_rfnet()
        import dataclasses
        mt = dataclasses.replace(m, tied_att_keys=True)
        return mt, mt.init_params(jax.random.PRNGKey(0)), fcs, atts

    def test_equals_untied_with_copied_key_weights(self):
        """A tied model must produce the SAME logprobs as the parity model
        whose per-step key weights are all set to the tied weights — proving
        the hoisting is exactly weight sharing, not an approximation."""
        mt, pt, fcs, atts = self._tied()
        m, p, _, _ = tiny_rfnet()
        seq, _ = labels()

        # build untied params from the tied ones: broadcast the tied key
        # weights to every step, copy everything else leaf-for-leaf
        S0, S = m.num_review_steps_0, m.num_review_steps
        pu = jax.tree_util.tree_map(lambda x: x, p)
        pu = {k: v for k, v in pt.items() if k not in ("review1_keys", "review2_keys")}
        review1 = []
        for j, cell in enumerate(pu["review1"]):
            cell = jax.tree_util.tree_map(lambda x: x, cell)
            kj = pt["review1_keys"][j]
            cell["att"] = dict(cell["att"])
            cell["att"]["att_2_att_h"] = {
                "w": jnp.broadcast_to(kj["w"], (S0,) + kj["w"].shape),
                "b": jnp.broadcast_to(kj["b"], (S0,) + kj["b"].shape),
            }
            review1.append(cell)
        pu["review1"] = tuple(review1)
        pu["review2"] = dict(pu["review2"])
        pu["review2"]["att"] = dict(pu["review2"]["att"])
        k2 = pt["review2_keys"]
        pu["review2"]["att"]["att_2_att_h"] = {
            "w": jnp.broadcast_to(k2["w"], (S,) + k2["w"].shape),
            "b": jnp.broadcast_to(k2["b"], (S,) + k2["b"].shape),
        }

        seqj = jnp.asarray(seq)
        lps_t, reason_t = mt.forward(pt, fcs, atts, seqj)
        lps_u, reason_u = m.forward(pu, fcs, atts, seqj)
        np.testing.assert_allclose(np.asarray(lps_t), np.asarray(lps_u),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(reason_t, reason_u):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_grads_reach_tied_keys_and_sampling_runs(self):
        mt, pt, fcs, atts = self._tied()
        seq, mask = labels()

        def loss_fn(p):
            lps, reason = mt.forward(p, fcs, atts, seq)
            top_true = jnp.full((B, 8), -1, jnp.int32).at[:, 0].set(1)
            return losses.review_net_ensemble_loss(
                lps, seq[:, 1:], mask[:, 1:], reason, top_true, 1.0
            )

        g = jax.grad(loss_fn)(pt)
        for j in range(mt.num_feat_array):
            assert float(jnp.abs(g["review1_keys"][j]["w"]).sum()) > 0
        assert float(jnp.abs(g["review2_keys"]["w"]).sum()) > 0

        from recurrent_fusion_network_tpu.decoding.api import model_sample
        out = model_sample(mt, pt, fcs, atts, beam_size=2)
        assert out.seq.shape == (B, mt.seq_length)

    def test_loss_decreases_under_adam(self):
        """Trainability gate, same pattern as the parity models' test:
        the tied variant overfits a fixed batch under Adam."""
        m, p, fcs, atts = self._tied()
        seq, mask = labels()
        optx = optax.adam(1e-2)
        opt_state = optx.init(p)

        def loss_fn(p):
            lps, _ = m.forward(p, fcs, atts, seq)
            return losses.language_model_loss(lps, seq[:, 1:], mask[:, 1:])

        @jax.jit
        def train_step(p, opt_state):
            l, g = jax.value_and_grad(loss_fn)(p)
            updates, opt_state = optx.update(g, opt_state)
            return optax.apply_updates(p, updates), opt_state, l

        l0 = None
        for _ in range(20):
            p, opt_state, l = train_step(p, opt_state)
            if l0 is None:
                l0 = float(l)
        assert float(l) < l0 * 0.8, (l0, float(l))

    def test_opt_flag_reaches_factory(self):
        from recurrent_fusion_network_tpu.config import Options

        opt = Options(caption_model="recurrent_fusion_model",
                      feature_type="feat_array",
                      feat_array_info=[{"fc_feat_size": 8, "att_feat_size": 10,
                                        "att_num": 6}],
                      tied_att_keys=1)
        opt.vocab_size, opt.seq_length = V, L
        m = setup(opt)
        assert m.tied_att_keys
        assert "review1_keys" in m.init_params(jax.random.PRNGKey(0))

    def test_reviewnet_tied_equals_untied_with_copied_keys(self):
        """Same exact-weight-sharing proof for ReviewNet's tied variant."""
        import dataclasses
        m, _, fc, att = tiny_reviewnet()
        mt = dataclasses.replace(m, tied_att_keys=True)
        pt = mt.init_params(jax.random.PRNGKey(0))
        seq, _ = labels()

        pu = {k: v for k, v in pt.items() if k != "review_keys"}
        pu["review"] = dict(pu["review"])
        pu["review"]["att"] = dict(pu["review"]["att"])
        S = m.num_review_steps
        kk = pt["review_keys"]
        pu["review"]["att"]["att_2_att_h"] = {
            "w": jnp.broadcast_to(kk["w"], (S,) + kk["w"].shape),
            "b": jnp.broadcast_to(kk["b"], (S,) + kk["b"].shape),
        }
        seqj = jnp.asarray(seq)
        lps_t, rt = mt.forward(pt, fc, att, seqj)
        lps_u, ru = m.forward(pu, fc, att, seqj)
        np.testing.assert_allclose(np.asarray(lps_t), np.asarray(lps_u),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rt[0]), np.asarray(ru[0]),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.quick
class TestProfilePolicy:
    """Round-3 profile policy: the TPU-native default trains the tied-keys
    RFNet; --reference_parity pins the strict reference architecture."""

    def _opt(self, **kw):
        return Options(caption_model="recurrent_fusion_model",
                       feature_type="synthetic", **kw)

    def test_default_profile_ties_keys(self):
        assert self._opt().tied_att_keys == 1

    def test_reference_parity_unties(self):
        assert self._opt(reference_parity=1).tied_att_keys == 0

    def test_explicit_flag_beats_profile(self):
        assert self._opt(tied_att_keys=0).tied_att_keys == 0
        assert self._opt(reference_parity=1, tied_att_keys=1).tied_att_keys == 1

    def test_model_factory_follows_profile(self):
        opt = self._opt()
        opt.vocab_size, opt.seq_length = 50, 8
        assert setup(opt).tied_att_keys
        opt2 = self._opt(reference_parity=1)
        opt2.vocab_size, opt2.seq_length = 50, 8
        assert not setup(opt2).tied_att_keys


class TestTiedSentinelResolution:
    def test_resolve_tied_auto_and_explicit(self):
        """bool(-1) is True, so the raw coercion silently built the TIED
        variant for opts that never ran finalize_options, even under
        --reference_parity (review r3). _resolve_tied replicates the CLI
        profile semantics for programmatic/legacy opts."""
        from types import SimpleNamespace

        from recurrent_fusion_network_tpu.models.base import _resolve_tied

        assert _resolve_tied(SimpleNamespace(tied_att_keys=-1,
                                             reference_parity=0)) is True
        assert _resolve_tied(SimpleNamespace(tied_att_keys=-1,
                                             reference_parity=1)) is False
        assert _resolve_tied(SimpleNamespace(tied_att_keys=0,
                                             reference_parity=0)) is False
        assert _resolve_tied(SimpleNamespace(tied_att_keys=1,
                                             reference_parity=1)) is True

    def test_use_remat_reaches_review_net(self):
        """--use_remat was silently dropped for ReviewNet (review r3): the
        flag must reach the model and keep the forward numerically
        identical (jax.checkpoint recomputes, never changes values)."""
        import numpy as np

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="review_net")
        opt.vocab_size, opt.seq_length = loader.vocab_size, loader.seq_length
        opt.use_remat = 1
        m = setup(opt)
        assert m.use_remat is True
        opt.use_remat = 0
        m0 = setup(opt)
        params = m0.init_params(jax.random.PRNGKey(0))
        d = loader.get_batch("train")
        fc, att = jnp.asarray(d["fc_feats"]), jnp.asarray(d["att_feats"])
        labels = jnp.asarray(d["labels"])

        def loss(model, p):
            lps, _ = model.forward(p, fc, att, labels)
            return (lps.astype(jnp.float32)).sum()

        g0 = jax.grad(lambda p: loss(m0, p))(params)
        g1 = jax.grad(lambda p: loss(m, p))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.quick
def test_remat_policy_typo_errors():
    """A misspelled remat policy must raise, not silently degrade to the
    save-nothing remat (advisor r4): the only symptom would be backward
    memory-traffic behavior. Both the model layer and config validation
    reject it."""
    from recurrent_fusion_network_tpu.config import validate_options
    from recurrent_fusion_network_tpu.models.base import remat_wrap

    remat_wrap(lambda c, x: (c, x), "full")  # valid spellings pass
    remat_wrap(lambda c, x: (c, x), "save_ctx")
    with pytest.raises(ValueError, match="remat policy"):
        remat_wrap(lambda c, x: (c, x), "save-ctx")

    opt = Options()
    opt.remat_policy = "save-ctx"
    with pytest.raises(AssertionError, match="remat_policy"):
        validate_options(opt)


@pytest.mark.quick
def test_low_rank_ctx_identity_matches_baseline():
    """With att_feat_sizes == rnn_size and value_proj pinned to the
    identity (zero bias), the low_rank_ctx model IS the baseline model:
    every shared weight initializes identically (same RNG paths, same
    shapes), the projection is a no-op, and forward outputs must agree to
    float tolerance. This proves the variant changes only WHERE the
    context is computed, not the math around it."""
    import dataclasses

    R = 12
    base = RecurrentFusionModel(
        vocab_size=V, seq_length=L,
        fc_feat_sizes=(8, 6), att_feat_sizes=(R, R), att_nums=(6, 4),
        input_encoding_size=12, rnn_size=R, att_hid_size=12,
        num_review_steps=3, num_review_steps_0=2, top_words_count=8,
    )
    lr = dataclasses.replace(base, low_rank_ctx=True)
    p_lr = lr.init_params(jax.random.PRNGKey(0))
    p_base = {k: v for k, v in p_lr.items() if k != "value_proj"}
    # identical shared-weight trees (D == R so z2h shapes match)
    p_ref = base.init_params(jax.random.PRNGKey(0))
    for a, b in zip(jax.tree_util.tree_leaves(p_base),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p_lr = dict(p_lr)
    p_lr["value_proj"] = tuple(
        {"w": jnp.eye(R), "b": jnp.zeros((R,))} for _ in range(2)
    )
    fcs = [jax.random.normal(jax.random.PRNGKey(10 + i), (B, d))
           for i, d in enumerate(base.fc_feat_sizes)]
    atts = [jax.random.normal(jax.random.PRNGKey(20 + i), (B, n, R))
            for i, n in enumerate(base.att_nums)]
    lab, msk = labels()
    lps_b, reason_b = base.forward(p_base, fcs, atts, lab,
                                   ss_prob=0.0, deterministic=True)
    lps_l, reason_l = lr.forward(p_lr, fcs, atts, lab,
                                 ss_prob=0.0, deterministic=True)
    np.testing.assert_allclose(np.asarray(lps_l), np.asarray(lps_b),
                               rtol=1e-5, atol=1e-6)
    for ra, rb in zip(reason_l, reason_b):
        np.testing.assert_allclose(np.asarray(ra), np.asarray(rb),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.quick
def test_low_rank_ctx_trains_and_grads_flow():
    """Heterogeneous dims (D_j != R): the variant must build, forward,
    and deliver nonzero grads to every leaf INCLUDING the new value_proj
    layers; loss decreases under adam."""
    import dataclasses

    m = RecurrentFusionModel(
        vocab_size=V, seq_length=L,
        fc_feat_sizes=(8, 6, 7), att_feat_sizes=(10, 9, 5), att_nums=(6, 4, 3),
        input_encoding_size=12, rnn_size=12, att_hid_size=12,
        num_review_steps=3, num_review_steps_0=2, top_words_count=8,
        low_rank_ctx=True,
    )
    p = m.init_params(jax.random.PRNGKey(0))
    assert len(p["value_proj"]) == 3
    assert p["value_proj"][0]["w"].shape == (10, 12)
    # z2h consumes rnn_size-dim contexts for every encoder
    for j in range(3):
        assert p["review1"][j]["z2h"]["w"].shape[-2:] == (12, 48)
    fcs = [jax.random.normal(jax.random.PRNGKey(10 + i), (B, d))
           for i, d in enumerate(m.fc_feat_sizes)]
    atts = [jax.random.normal(jax.random.PRNGKey(20 + i), (B, n, d))
            for i, (n, d) in enumerate(zip(m.att_nums, m.att_feat_sizes))]
    lab, msk = labels()

    def loss_fn(p):
        lps, _ = m.forward(p, fcs, atts, lab, ss_prob=0.0, deterministic=True)
        return losses.language_model_loss(lps, lab, msk)

    l0, g = jax.value_and_grad(loss_fn)(p)
    assert np.isfinite(float(l0))
    for leaf in jax.tree_util.tree_leaves(g["value_proj"]):
        assert float(jnp.abs(leaf).sum()) > 0
    tx = optax.adam(1e-3)
    st = tx.init(p)
    pp = p
    for _ in range(8):
        _, g = jax.value_and_grad(loss_fn)(pp)
        up, st = tx.update(g, st, pp)
        pp = optax.apply_updates(pp, up)
    assert float(loss_fn(pp)) < float(l0)


@pytest.mark.quick
def test_low_rank_ctx_arch_guard():
    """A low_rank_ctx checkpoint must refuse to load into a CLI that
    resolved the flag differently (the trees differ: value_proj + z2h
    shapes) — same contract as every other ARCH_KEYS field."""
    from recurrent_fusion_network_tpu.training.checkpoint import \
        assert_arch_matches

    opt = Options()
    opt.low_rank_ctx = 0
    with pytest.raises(AssertionError, match="low_rank_ctx"):
        assert_arch_matches(opt, {"low_rank_ctx": 1})
    assert_arch_matches(opt, {"low_rank_ctx": 0})
    assert_arch_matches(opt, {})  # pre-r5 checkpoints skip the key
