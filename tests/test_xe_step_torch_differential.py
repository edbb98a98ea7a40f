"""End-to-end XE TRAIN-STEP differential test vs torch.

The cores and criterions are torch-parity tested individually, and the full
RFNet forward is logit-level tested (test_rfnet_torch_differential.py); this
test pins the remaining COMPOSITION: forward x ReviewNetEnsembleCriterion
(XE + label smoothing + M+1 MultiLabelMargin reason heads, the exact
reference step train.py:145-158 + misc/utils.py:153-192) — both the scalar
loss AND the gradient of that loss w.r.t. EVERY parameter leaf, computed by
torch autograd on the float64 reference equations and by jax.grad on our
float32 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from recurrent_fusion_network_tpu.models import RecurrentFusionModel

from test_rfnet_torch_differential import _torch_f64, torch_rfnet_forward  # noqa: F401


def torch_ensemble_criterion(log_prob, reason_preds, labels, masks, top_words,
                             reason_weight, *, eps=None):
    """ReviewNetEnsembleCriterion (misc/utils.py:161-192) in torch: masked XE
    normalized by batch size + reason_weight * mean over heads of
    torch.nn.MultiLabelMarginLoss (the exact module our jnp loss replicates).
    """
    B, T, V = log_prob.shape
    target = torch.from_numpy(labels[:, 1 : T + 1])
    mask = torch.from_numpy(masks[:, 1 : T + 1]).to(log_prob.dtype)
    if eps is not None:
        one_hot = torch.nn.functional.one_hot(target, V).to(log_prob.dtype)
        smoothed = one_hot * (1.0 - eps) + eps / V
        nll = -(log_prob * smoothed).sum(-1) * mask
    else:
        nll = -log_prob.gather(2, target.unsqueeze(-1)).squeeze(-1) * mask
    xe = nll.sum() / B

    mlm = torch.nn.MultiLabelMarginLoss()
    y = torch.from_numpy(top_words)
    disc = sum(mlm(x, y) for x in reason_preds) / len(reason_preds)
    return xe + reason_weight * disc


@pytest.mark.parametrize("smoothing", [False, True])
def test_xe_step_loss_and_grads_match_torch(smoothing):
    from recurrent_fusion_network_tpu.config import Options
    from recurrent_fusion_network_tpu.training.criterion import make_criterion

    model = RecurrentFusionModel(
        vocab_size=12, seq_length=5,
        fc_feat_sizes=(7, 5), att_feat_sizes=(9, 6), att_nums=(4, 3),
        input_encoding_size=8, rnn_size=8, att_hid_size=8,
        num_review_steps=2, num_review_steps_0=3, top_words_count=6,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    g = np.random.default_rng(1)
    B = 3
    fcs = [g.standard_normal((B, d)).astype(np.float32) for d in model.fc_feat_sizes]
    atts = [g.standard_normal((B, n, d)).astype(np.float32)
            for n, d in zip(model.att_nums, model.att_feat_sizes)]
    labels = np.zeros((B, model.seq_length + 2), np.int64)
    labels[:, 1:5] = g.integers(1, 13, (B, 4))  # row lengths < L: real padding
    masks = np.zeros((B, model.seq_length + 2), np.float32)
    for r in range(B):
        masks[r, : int((labels[r] != 0).sum()) + 2] = 1.0
    top_words = np.full((B, model.top_words_count), -1, np.int64)
    top_words[:, :2] = g.integers(0, model.top_words_count, (B, 2))

    opt = Options(
        caption_model="recurrent_fusion_model",
        feature_type="feat_array",
        feat_array_info=[
            {"fc_feat_size": f, "att_feat_size": a, "att_num": n}
            for f, a, n in zip(model.fc_feat_sizes, model.att_feat_sizes,
                               model.att_nums)
        ],
        use_label_smoothing=int(smoothing),
        label_smoothing_epsilon=0.1,
        reason_weight=0.3,
    )
    opt.vocab_size = model.vocab_size
    opt.seq_length = model.seq_length
    crit = make_criterion(opt)

    def loss_fn(p):
        lps, reason = model.forward(
            p, [jnp.asarray(f) for f in fcs], [jnp.asarray(a) for a in atts],
            jnp.asarray(labels),
        )
        return crit(lps, jnp.asarray(labels), jnp.asarray(masks), reason,
                    jnp.asarray(top_words))

    loss_jax, grads_jax = jax.value_and_grad(loss_fn)(params)

    # torch reference: float64 equations, autograd through the whole step
    tparams = jax.tree_util.tree_map(
        lambda x: torch.tensor(np.asarray(x, np.float64), requires_grad=True),
        params,
    )
    lps_t, reason_t = torch_rfnet_forward(model, tparams, fcs, atts, labels)
    loss_t = torch_ensemble_criterion(
        lps_t, reason_t, labels, masks, top_words, opt.reason_weight,
        eps=0.1 if smoothing else None,
    )
    loss_t.backward()

    np.testing.assert_allclose(
        float(loss_jax), loss_t.item(), rtol=1e-5,
        err_msg="XE-step loss diverges from the torch reference step",
    )

    grads_t = jax.tree_util.tree_map(
        lambda x: np.zeros_like(np.asarray(x)) if x.grad is None
        else x.grad.numpy(),
        tparams,
    )
    flat_j, tree_j = jax.tree_util.tree_flatten(grads_jax)
    flat_t, tree_t = jax.tree_util.tree_flatten(grads_t)
    assert tree_j == tree_t
    checked = 0
    for gj, gt, path in zip(
        flat_j, flat_t,
        [jax.tree_util.keystr(p) for p, _ in
         jax.tree_util.tree_flatten_with_path(grads_jax)[0]],
    ):
        np.testing.assert_allclose(
            np.asarray(gj), gt, rtol=2e-3, atol=2e-5,
            err_msg=f"gradient diverges at {path}",
        )
        checked += 1
    assert checked == len(flat_j) and checked > 20  # every leaf compared
