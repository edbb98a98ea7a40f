"""RecurrentFusionModel — the paper's model (Jiang et al., ECCV 2018).

Equivalent of the reference's ``misc/RecurrentFusionModel.py``:

  stage I  (:198-231): per-encoder fc->h init states; ``num_review_steps_0``
      UNTIED fusion steps — at each step every encoder's LSTM receives the
      concatenation H of ALL encoders' hidden states (the interaction) plus
      attention over its own spatial features — emitting per-encoder thought
      vectors and per-encoder reason logits;
  stage II (:233-255): states averaged across encoders, then
      ``num_review_steps`` UNTIED multi-attention steps over the M
      thought-vector sets -> combined thought vectors + combined reason head;
  decoder  (:257-281): attention-LSTM over the combined thought vectors with
      log-softmax output.

TPU-first: per-step untied weights are stacked on a leading step axis and
consumed by `lax.scan` (one scan per stage); the M heterogeneous encoders are
a static Python tuple inside the scan body (their fc/att dims differ, so no
padding waste); stage-II heads and the decoder use stacked homogeneous
attention with precomputed keys.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import attention, cells
from ..ops.initializers import apply_linear, linear, stack_params
from .base import (EncodeOut, _resolve_tied, embed_tokens,
                   init_embed_logit, remat_wrap, xe_decode)


@dataclasses.dataclass(frozen=True)
class RecurrentFusionModel:
    vocab_size: int
    seq_length: int
    fc_feat_sizes: Tuple[int, ...]
    att_feat_sizes: Tuple[int, ...]
    att_nums: Tuple[int, ...]
    input_encoding_size: int = 512
    rnn_size: int = 512
    att_hid_size: int = 512
    drop_prob_lm: float = 0.0
    drop_prob_reason: float = 0.0
    drop_prob_fusion: float = 0.0
    num_review_steps: int = 8
    num_review_steps_0: int = 8
    top_words_count: int = 1000
    review_maxout: bool = False
    decoder_maxout: bool = False
    fusion_maxout: bool = False
    # rematerialize scan-step activations in the backward pass: ~1/3 more
    # forward FLOPs for a 2-3x larger training-batch HBM ceiling
    use_remat: bool = False
    # remat policy: "save_ctx" (default) saves the tiny per-step attention
    # contexts/weights so the backward recompute never re-reads the (B, A, D)
    # feature arrays a third time; "full" is the round-2 save-nothing remat.
    # Bitwise-identical outputs either way (see models/base.py::remat_wrap).
    remat_policy: str = "save_ctx"
    # TPU-native OPT-IN variant (off = strict reference parity): tie the
    # h-independent attention-KEY projections across review steps, so each
    # encoder's (B, A_j, D_j) x (D_j, H) key matmul runs once instead of once
    # per untied step. These projections are the measured majority of encode
    # time (PERF_NOTES.md §2: ~74% of the decode pipeline); queries
    # (h_2_att_h) and every other weight stay untied per step.
    tied_att_keys: bool = False
    # TPU-native OPT-IN variant (off = strict reference parity): project
    # each encoder's spatial features ONCE to rnn_size (a learned per-
    # encoder value projection) and compute stage-I attention CONTEXTS in
    # that space; z2h consumes rnn_size-dim contexts. The per-review-step
    # (B, A_j, D_j) value reads are the measured majority of train-step
    # HBM traffic (PROFILE_TRAIN_r05: the step runs at the memory roofline,
    # not the MXU's), and D_j/rnn_size is 2.5-4.3x at flagship dims, so
    # this trades a rank-512 context bottleneck for ~3.6x less per-step
    # value traffic. Attention SCORES still see the full-D features (keys
    # are computed from the raw features exactly as before); only the
    # weighted-sum values are low-rank. Quality validated on the proxy
    # chain (PIPELINE_PROXY_LOWRANK.json).
    low_rank_ctx: bool = False

    @property
    def num_feat_array(self) -> int:
        return len(self.fc_feat_sizes)

    @classmethod
    def from_opt(cls, opt):
        feats = opt.feat_array_info
        return cls(
            vocab_size=opt.vocab_size,
            seq_length=opt.seq_length,
            fc_feat_sizes=tuple(f["fc_feat_size"] for f in feats),
            att_feat_sizes=tuple(f["att_feat_size"] for f in feats),
            att_nums=tuple(f["att_num"] for f in feats),
            input_encoding_size=opt.input_encoding_size,
            rnn_size=opt.rnn_size,
            att_hid_size=opt.att_hid_size,
            drop_prob_lm=opt.drop_prob_lm,
            drop_prob_reason=opt.drop_prob_reason,
            drop_prob_fusion=opt.drop_prob_fusion,
            num_review_steps=opt.num_review_steps,
            num_review_steps_0=opt.num_review_steps_0,
            top_words_count=opt.top_words_count,
            review_maxout=bool(opt.review_maxout),
            decoder_maxout=bool(opt.maxout),
            fusion_maxout=bool(opt.fusion_maxout),
            use_remat=bool(getattr(opt, 'use_remat', 0)),
            remat_policy=str(getattr(opt, 'remat_policy', 'save_ctx') or 'save_ctx'),
            tied_att_keys=_resolve_tied(opt),
            low_rank_ctx=bool(getattr(opt, "low_rank_ctx", 0)),
        )

    # ------------------------------------------------------------------ params

    def init_params(self, rng):
        M, R = self.num_feat_array, self.rnn_size
        H_size = M * R
        (k_fc, k_el, k_r1, k_rli, k_r2, k_rl, k_dec) = jax.random.split(rng, 7)

        fc_keys = jax.random.split(k_fc, M)
        fc2h = [
            linear(k, self.fc_feat_sizes[i], R, bias="default")
            for i, k in enumerate(fc_keys)
        ]

        embed, logit = init_embed_logit(k_el, self.vocab_size, self.input_encoding_size, R)

        # Stage I: per-encoder stack of num_review_steps_0 untied fusion cells.
        # Deliberate divergence: --fusion_maxout reaches the stage-I cells
        # here, whereas the reference's FeatArrayFusionNoInputCore never
        # forwards it to LSTMFusionNoInputCore (RecurrentFusionModel.py:93-97)
        # so its stage I is always tanh. That is dropped plumbing, not a
        # semantic choice; the flag default (0) keeps strict-parity behavior.
        review1 = []
        review1_keys = []
        value_proj = []
        for i in range(M):
            step_keys = jax.random.split(jax.random.fold_in(k_r1, i), self.num_review_steps_0)
            step_cells = [
                cells.fusion_lstm_init(
                    k, H_size, R, self.att_feat_sizes[i], self.att_hid_size,
                    maxout=self.fusion_maxout,
                    ctx_size=R if self.low_rank_ctx else None,
                )
                for k in step_keys
            ]
            if self.low_rank_ctx:
                # one value projection per encoder, applied once per
                # sequence (same init convention as the tied key heads)
                value_proj.append(
                    linear(
                        jax.random.fold_in(k_r1, 2000 + i),
                        self.att_feat_sizes[i], R, bias="uniform",
                    )
                )
            if self.tied_att_keys:
                # one key projection per encoder, shared by every step;
                # drop the per-step copies from the scanned stack
                for c in step_cells:
                    del c["att"]["att_2_att_h"]
                review1_keys.append(
                    linear(
                        jax.random.fold_in(k_r1, 1000 + i),
                        self.att_feat_sizes[i], self.att_hid_size,
                        bias="uniform",
                    )
                )
            review1.append(stack_params(step_cells))

        rli_keys = jax.random.split(k_rli, M)
        reason_individual = [
            linear(k, R, self.top_words_count, bias="default") for k in rli_keys
        ]

        # Stage II: stack of num_review_steps untied multi-attention cells.
        r2_keys = jax.random.split(k_r2, self.num_review_steps)
        step_cells2 = [
            cells.multi_att_lstm_init(
                k, R, R, M, self.att_hid_size, maxout=self.review_maxout
            )
            for k in r2_keys
        ]
        review2_keys = None
        if self.tied_att_keys:
            for c in step_cells2:
                del c["att"]["att_2_att_h"]
            head_keys = jax.random.split(jax.random.fold_in(k_r2, 999), M)
            review2_keys = stack_params(
                [linear(k, R, self.att_hid_size, bias="uniform") for k in head_keys]
            )  # leading axis M
        review2 = stack_params(step_cells2)

        params = {
            "fc2h": fc2h,
            "embed": embed,
            "logit": logit,
            "review1": tuple(review1),  # tuple of M pytrees, leading axis R0
            "reason_individual": tuple(reason_individual),
            "review2": review2,  # leading axis = review step (then M heads)
            "reason_linear": linear(k_rl, R, self.top_words_count, bias="default"),
            "decoder": cells.att_lstm_init(
                k_dec, self.input_encoding_size, R, R, self.att_hid_size,
                maxout=self.decoder_maxout,
            ),
        }
        if self.tied_att_keys:
            params["review1_keys"] = tuple(review1_keys)  # M per-encoder
            params["review2_keys"] = review2_keys  # (M, R, H)
        if self.low_rank_ctx:
            params["value_proj"] = tuple(value_proj)  # M x (D_j -> R)
        return params

    # ------------------------------------------------------------- public API

    def embed(self, params, tokens):
        return embed_tokens(params, tokens)

    def encode(self, params, fc_feats, att_feats, *, rng=None, deterministic=True):
        """fc_feats / att_feats: sequences of M arrays (heterogeneous dims)."""
        M, R = self.num_feat_array, self.rnn_size
        assert len(fc_feats) == M and len(att_feats) == M

        # fc -> per-encoder init states (misc/RecurrentFusionModel.py:202-208)
        states = tuple(
            (h, h) for h in (apply_linear(params["fc2h"][i], fc_feats[i]) for i in range(M))
        )

        r1 = None if rng is None else jax.random.fold_in(rng, 1)
        r2 = None if rng is None else jax.random.fold_in(rng, 2)

        # hoist the h-independent attention-key projections out of the scan.
        # untied (reference parity): one (B*A_j, D_j) x (D_j, R0*H) matmul per
        # encoder, producing per-step keys. tied (--tied_att_keys): a single
        # (B*A_j, D_j) x (D_j, H) matmul per encoder shared by every step —
        # an R0x FLOP cut on the dominant encode cost (PERF_NOTES.md §2).
        keys1 = []
        for j in range(M):
            if self.tied_att_keys:
                keys1.append(
                    attention.precompute_keys(
                        {"att_2_att_h": params["review1_keys"][j]}, att_feats[j]
                    )  # (B, A, H)
                )
            else:
                a = params["review1"][j]["att"]["att_2_att_h"]
                keys1.append(
                    jnp.einsum("bad,sdh->sbah", att_feats[j], a["w"])
                    + a["b"][:, None, None, :]
                )
        keys1 = tuple(keys1)

        # low_rank_ctx: project each encoder's values ONCE per sequence
        # (B, A, D_j) -> (B, A, R). Keys above are computed from the RAW
        # features (scores see full-D information); only the weighted-sum
        # values — the dominant per-step HBM read — are low-rank. XLA fuses
        # this pass with the key projection's read of the same arrays.
        if self.low_rank_ctx:
            values = tuple(
                apply_linear(params["value_proj"][j], att_feats[j])
                for j in range(M)
            )
        else:
            values = att_feats

        # ---- stage I: interacting fusion review --------------------------------
        def stage1(carry, step_in):
            states, i = carry
            if self.tied_att_keys:
                step_params, step_keys = step_in, keys1  # shared keys
            else:
                step_params, step_keys = step_in
            H = jnp.concatenate([st[0] for st in states], axis=1)  # (B, M*R)
            outs, reasons, new_states = [], [], []
            for j in range(M):
                r = None if r1 is None else jax.random.fold_in(r1, i * M + j)
                out, st = cells.fusion_lstm_step(
                    step_params[j],
                    H,
                    values[j],
                    states[j],
                    keys=step_keys[j],
                    rnn_size=R,
                    maxout=self.fusion_maxout,
                    drop_rate=self.drop_prob_fusion,
                    rng=r,
                    deterministic=deterministic,
                )
                outs.append(out)
                reasons.append(apply_linear(params["reason_individual"][j], out))
                new_states.append(st)
            return (tuple(new_states), i + 1), (tuple(outs), tuple(reasons))

        if self.use_remat:
            stage1 = remat_wrap(stage1, self.remat_policy)
        xs1 = params["review1"] if self.tied_att_keys else (params["review1"], keys1)
        (states, _), (thought_seqs, reason_seqs) = jax.lax.scan(
            stage1, (states, 0), xs1
        )
        # thought_seqs: tuple of M arrays (R0, B, R)
        thoughts_i = [jnp.transpose(t, (1, 0, 2)) for t in thought_seqs]  # M x (B,R0,R)
        reason_preds = [jnp.max(r, axis=0) for r in reason_seqs]  # M x (B,W)

        # ---- average states across encoders (misc/RecurrentFusionModel.py:233-237)
        h_avg = sum(st[0] for st in states) / M
        c_avg = sum(st[1] for st in states) / M
        state = (h_avg, c_avg)

        # ---- stage II: multi-attention combine ---------------------------------
        thought_stack = jnp.stack(thoughts_i, axis=0)  # (M, B, R0, R)
        if self.tied_att_keys:
            kw = params["review2_keys"]  # w: (M, R, H)
            keys2 = (
                jnp.einsum("mbar,mrh->mbah", thought_stack, kw["w"])
                + kw["b"][:, None, None, :]
            )
        else:
            a2 = params["review2"]["att"]["att_2_att_h"]  # w: (S, M, R, H)
            keys2 = (
                jnp.einsum("mbar,smrh->smbah", thought_stack, a2["w"])
                + a2["b"][:, :, None, None, :]
            )

        def stage2(carry, step_in):
            state, i = carry
            if self.tied_att_keys:
                step_params, step_keys = step_in, keys2  # shared keys
            else:
                step_params, step_keys = step_in
            r = None if r2 is None else jax.random.fold_in(r2, i)
            out, state = cells.multi_att_lstm_step(
                step_params,
                thought_stack,
                state,
                keys_stack=step_keys,
                rnn_size=R,
                maxout=self.review_maxout,
                drop_rate=self.drop_prob_reason,
                rng=r,
                deterministic=deterministic,
            )
            reason = apply_linear(params["reason_linear"], out)
            return (state, i + 1), (out, reason)

        if self.use_remat:
            stage2 = remat_wrap(stage2, self.remat_policy)
        xs2 = params["review2"] if self.tied_att_keys else (params["review2"], keys2)
        (state, _), (comb_outs, comb_reasons) = jax.lax.scan(
            stage2, (state, 0), xs2
        )
        thoughts_comb = jnp.transpose(comb_outs, (1, 0, 2))  # (B, S, R)
        reason_preds.append(jnp.max(comb_reasons, axis=0))

        memory = {
            "thoughts": thoughts_comb,
            "keys": attention.precompute_keys(params["decoder"]["att"], thoughts_comb),
        }
        return EncodeOut(memory=memory, state=state, reason_preds=reason_preds)

    def _decode_out(self, params, xt, memory, state, rng, deterministic):
        # NOTE on hand-written kernels: round 2 measured the decode step
        # within ~1.5x of this chip's achievable matmul throughput and only
        # ~26% of pipeline time (PERF_NOTES.md); the round-1 fused Pallas
        # step was removed — XLA owns these shapes.
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
        out, state = self._decode_out(params, xt, memory, state, rng, deterministic)
        return apply_linear(params["logit"], out), state

    def decode_logprobs(self, params, xt, memory, state, *, rng=None, deterministic=True):
        logits, state = self.decode_logits(
            params, xt, memory, state, rng=rng, deterministic=deterministic,
        )
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
