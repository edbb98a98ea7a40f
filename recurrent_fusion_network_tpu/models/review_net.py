"""ReviewNetModel — Review Net (Yang et al. 2016) captioner.

Equivalent of the reference's ``misc/ReviewNetModel.py``: fc->h init
(:76-79), ``num_review_steps`` UNTIED no-input attention-LSTM review cells
producing thought vectors (:82-87), a discriminative "reason" head predicting
top-1000 words via max-pool over review steps (:87-97), an attention-LSTM
decoder over the thought vectors (:121), and an optional Mixture-of-Softmax
output head (:59-60, :122-125).

The reference's review-cell call is bitrotted (4-arg signature at
misc/LSTMSoftAttentionNoInputCore.py:53 vs the 2-arg call site); this
implementation uses the intended (att_seq, state) semantics.

TPU-first: the untied per-step weights are stacked on a leading step axis and
consumed by one ``lax.scan``; the decoder's attention keys over thought
vectors are precomputed once per image.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import attention, cells, mos
from ..ops.initializers import apply_linear, linear, stack_params
from .base import (EncodeOut, _resolve_tied, embed_tokens,
                   init_embed_logit, remat_wrap, xe_decode)


@dataclasses.dataclass(frozen=True)
class ReviewNetModel:
    vocab_size: int
    seq_length: int
    input_encoding_size: int = 512
    rnn_size: int = 512
    att_hid_size: int = 512
    drop_prob_lm: float = 0.0
    drop_prob_reason: float = 0.0
    fc_feat_size: int = 2048
    att_feat_size: int = 2048
    att_num: int = 196
    num_review_steps: int = 8
    top_words_count: int = 1000
    review_maxout: bool = False
    decoder_maxout: bool = False
    use_mos: bool = False
    num_expert: int = 10
    # rematerialize the review scan + XE decode in the backward pass
    # (--use_remat; same lever as RecurrentFusionModel.use_remat — the flag
    # was silently dropped for ReviewNet before r3)
    use_remat: bool = False
    # remat policy (see models/base.py::remat_wrap): "save_ctx" keeps the
    # tiny per-step attention contexts/weights out of the backward recompute
    remat_policy: str = "save_ctx"
    # share attention-KEY projections across review steps (the same opt-in
    # TPU-native variant as RecurrentFusionModel.tied_att_keys; off = parity)
    tied_att_keys: bool = False

    @classmethod
    def from_opt(cls, opt):
        if getattr(opt, "low_rank_ctx", 0):
            # silent no-op would misreport the trained architecture — the
            # variant is RecurrentFusionModel-only (config.py low_rank_ctx)
            raise ValueError(
                "--low_rank_ctx is a recurrent_fusion_model variant; "
                "review_net does not implement it"
            )
        if opt.feat_array_info:
            info = opt.feat_array_info[0]
            fc, att, num = info["fc_feat_size"], info["att_feat_size"], info["att_num"]
        else:
            fc, att, num = opt.fc_feat_size, opt.att_feat_size, opt.att_num
        return cls(
            vocab_size=opt.vocab_size,
            seq_length=opt.seq_length,
            input_encoding_size=opt.input_encoding_size,
            rnn_size=opt.rnn_size,
            att_hid_size=opt.att_hid_size,
            drop_prob_lm=opt.drop_prob_lm,
            drop_prob_reason=opt.drop_prob_reason,
            fc_feat_size=fc,
            att_feat_size=att,
            att_num=num,
            num_review_steps=opt.num_review_steps,
            top_words_count=opt.top_words_count,
            review_maxout=bool(opt.review_maxout),
            decoder_maxout=bool(opt.maxout),
            use_mos=bool(opt.use_mos),
            num_expert=opt.num_expert,
            use_remat=bool(getattr(opt, "use_remat", 0)),
            remat_policy=str(getattr(opt, "remat_policy", "save_ctx") or "save_ctx"),
            tied_att_keys=_resolve_tied(opt),
        )

    # ------------------------------------------------------------------ params

    def init_params(self, rng):
        k_fc, k_el, k_rev, k_rl, k_dec, k_mos = jax.random.split(rng, 6)
        # with use_mos the 'logit' head is DEAD (decode branches to mos) —
        # kept anyway because the reference creates and initializes it too
        # (misc/ReviewNetModel.py:43,69-70), so checkpoints stay
        # structure-compatible across the flag; weight decay drifts it
        # exactly like the reference's does
        embed, logit = init_embed_logit(
            k_el, self.vocab_size, self.input_encoding_size, self.rnn_size
        )
        rev_keys = jax.random.split(k_rev, self.num_review_steps)
        step_cells = [
            cells.no_input_lstm_init(
                k, self.rnn_size, self.att_feat_size, self.att_hid_size,
                maxout=self.review_maxout,
            )
            for k in rev_keys
        ]
        review_keys = None
        if self.tied_att_keys:
            for c in step_cells:
                del c["att"]["att_2_att_h"]
            review_keys = linear(
                jax.random.fold_in(k_rev, 999),
                self.att_feat_size, self.att_hid_size, bias=0.0,
            )
        review = stack_params(step_cells)
        params = {
            "fc2h": linear(k_fc, self.fc_feat_size, self.rnn_size, bias="default"),
            "embed": embed,
            "logit": logit,
            "review": review,  # leading axis = review step
            "reason_linear": linear(
                k_rl, self.rnn_size, self.top_words_count, bias="default"
            ),
            "decoder": cells.att_lstm_init(
                k_dec,
                self.input_encoding_size,
                self.rnn_size,
                self.rnn_size,  # attends over thought vectors
                self.att_hid_size,
                maxout=self.decoder_maxout,
            ),
        }
        if self.use_mos:
            params["mos"] = mos.init(
                k_mos, self.rnn_size, self.rnn_size, self.num_expert, self.vocab_size + 1
            )
        if self.tied_att_keys:
            params["review_keys"] = review_keys
        return params

    # ------------------------------------------------------------- public API

    def embed(self, params, tokens):
        return embed_tokens(params, tokens)

    def encode(self, params, fc_feats, att_feats, *, rng=None, deterministic=True):
        init_h = apply_linear(params["fc2h"], fc_feats)
        state = (init_h, init_h)

        # hoist the h-independent attention-key projections of ALL untied
        # review steps out of the scan: one (B*A, D) x (D, S*H) matmul
        # instead of S sequential (B*A, D) x (D, H) matmuls. With
        # --tied_att_keys the projection is a single (B*A, D) x (D, H)
        # matmul shared by every step.
        if self.tied_att_keys:
            keys_all = attention.precompute_keys(
                {"att_2_att_h": params["review_keys"]}, att_feats
            )  # (B, A, H)
        else:
            rev_att = params["review"]["att"]["att_2_att_h"]
            keys_all = (
                jnp.einsum("bad,sdh->sbah", att_feats, rev_att["w"])
                + rev_att["b"][:, None, None, :]
            )

        def review_step(carry, step_in):
            state, i = carry
            if self.tied_att_keys:
                step_params, step_keys = step_in, keys_all
            else:
                step_params, step_keys = step_in
            r = None if rng is None else jax.random.fold_in(rng, i)
            out, state = cells.no_input_lstm_step(
                step_params,
                att_feats,
                state,
                keys=step_keys,
                rnn_size=self.rnn_size,
                maxout=self.review_maxout,
                drop_rate=self.drop_prob_reason,
                rng=r,
                deterministic=deterministic,
            )
            reason = apply_linear(params["reason_linear"], out)
            return (state, i + 1), (out, reason)

        if self.use_remat:
            review_step = remat_wrap(review_step, self.remat_policy)
        xs = params["review"] if self.tied_att_keys else (params["review"], keys_all)
        (state, _), (thoughts, reasons) = jax.lax.scan(
            review_step, (state, 0), xs
        )
        thoughts = jnp.transpose(thoughts, (1, 0, 2))  # (B, S, R)
        reason_pred = jnp.max(reasons, axis=0)  # max over steps -> (B, W)
        memory = {
            "thoughts": thoughts,
            "keys": attention.precompute_keys(params["decoder"]["att"], thoughts),
        }
        return EncodeOut(memory=memory, state=state, reason_preds=[reason_pred])

    def _decode_out(self, params, xt, memory, state, rng, deterministic):
        # hand-written decode kernels measured a wash vs XLA here; see
        # PERF_NOTES.md for the round-2 measurements
        return cells.att_lstm_step(
            params["decoder"],
            xt,
            memory["thoughts"],
            state,
            keys=memory["keys"],
            rnn_size=self.rnn_size,
            maxout=self.decoder_maxout,
            drop_rate=self.drop_prob_lm,
            rng=rng,
            deterministic=deterministic,
        )

    def decode_logits(self, params, xt, memory, state, *, rng=None, deterministic=True):
        """Ensemble hook; for MoS models this returns mixture PROBABILITIES,
        matching the reference's one_time_step (misc/ReviewNetModel.py:156-165)."""
        out, state = self._decode_out(params, xt, memory, state, rng, deterministic)
        if self.use_mos:
            return mos.apply(params["mos"], out), state
        return apply_linear(params["logit"], out), state

    def decode_logprobs(self, params, xt, memory, state, *, rng=None, deterministic=True):
        out, state = self._decode_out(params, xt, memory, state, rng, deterministic)
        if self.use_mos:
            return mos.log_apply(params["mos"], out), state
        logits = apply_linear(params["logit"], out)
        return jax.nn.log_softmax(logits.astype(jnp.float32)), state

    def forward(
        self, params, fc_feats, att_feats, seq, *, ss_prob=0.0, rng=None, deterministic=True
    ):
        enc_rng, dec_rng = (None, None) if rng is None else jax.random.split(rng)
        enc = self.encode(
            params, fc_feats, att_feats, rng=enc_rng, deterministic=deterministic
        )
        seq_in = seq[:, : self.seq_length + 1]

        def step(xt, state, r):
            return self.decode_logprobs(
                params, xt, enc.memory, state, rng=r, deterministic=deterministic,
            )

        lps = xe_decode(
            step,
            lambda toks: self.embed(params, toks),
            enc.state,
            seq_in,
            ss_prob=ss_prob,
            rng=dec_rng,
            vocab_size=self.vocab_size,
            remat=self.use_remat,
            remat_policy=self.remat_policy,
        )
        return lps, enc.reason_preds
