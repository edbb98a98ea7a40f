"""ShowTellModel — the NIC baseline.

Equivalent of the reference's ``misc/ShowTellModel.py``: the image fc feature
is embedded and fed as the step-0 input to a bias-free (multi-layer) LSTM
(misc/ShowTellModel.py:25-26); subsequent steps consume token embeddings;
the step-0 output is dropped (misc/ShowTellModel.py:79). Scheduled sampling
follows misc/ShowTellModel.py:55-67.

TPU-first: the image step happens inside ``encode`` so all decode engines see
a uniform (memory=None, state) interface, and the token loop is one
``lax.scan``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import cells
from ..ops.initializers import linear
from .base import EncodeOut, embed_tokens, init_embed_logit, xe_decode


@dataclasses.dataclass(frozen=True)
class ShowTellModel:
    vocab_size: int
    seq_length: int
    input_encoding_size: int = 512
    rnn_size: int = 512
    num_layers: int = 1
    drop_prob_lm: float = 0.0
    fc_feat_size: int = 2048

    @classmethod
    def from_opt(cls, opt):
        if getattr(opt, "low_rank_ctx", 0):
            raise ValueError(
                "--low_rank_ctx is a recurrent_fusion_model variant; "
                "show_tell has no attention path"
            )
        fc = opt.feat_array_info[0]["fc_feat_size"] if opt.feat_array_info else opt.fc_feat_size
        return cls(
            vocab_size=opt.vocab_size,
            seq_length=opt.seq_length,
            input_encoding_size=opt.input_encoding_size,
            rnn_size=opt.rnn_size,
            num_layers=opt.num_layers,
            drop_prob_lm=opt.drop_prob_lm,
            fc_feat_size=fc,
        )

    # ------------------------------------------------------------------ params

    def init_params(self, rng):
        k_ie, k_el, k_core = jax.random.split(rng, 3)
        embed, logit = init_embed_logit(
            k_el, self.vocab_size, self.input_encoding_size, self.rnn_size
        )
        layer_keys = jax.random.split(k_core, self.num_layers)
        layers = []
        for l, k in enumerate(layer_keys):
            in_dim = self.input_encoding_size if l == 0 else self.rnn_size
            layers.append(cells.plain_lstm_init(k, in_dim, self.rnn_size))
        return {
            # img_embed keeps torch nn.Linear default init
            # (not re-initialized in misc/ShowTellModel.py:32-36)
            "img_embed": linear(
                k_ie, self.fc_feat_size, self.input_encoding_size, weight="default"
            ),
            "embed": embed,
            "logit": logit,
            "core": layers,
        }

    # ------------------------------------------------------------------- core

    def _core(self, params, xt, state, rng=None, deterministic=True):
        """Stacked bias-free LSTM; inter-layer dropout like torch nn.LSTM."""
        new_state = []
        h = xt
        for l, (layer, st) in enumerate(zip(params["core"], state)):
            h, st = cells.plain_lstm_step(layer, h, st, rnn_size=self.rnn_size)
            new_state.append(st)
            if l < self.num_layers - 1:
                sub = None if rng is None else jax.random.fold_in(rng, l)
                h = cells.maybe_dropout(sub, h, self.drop_prob_lm, deterministic)
        return h, tuple(new_state)

    def _zero_state(self, B):
        z = jnp.zeros((B, self.rnn_size))
        return tuple((z, z) for _ in range(self.num_layers))

    # ------------------------------------------------------------- public API

    def embed(self, params, tokens):
        return embed_tokens(params, tokens)

    def encode(self, params, fc_feats, att_feats=None, *, rng=None, deterministic=True):
        """Run the image step; the resulting state conditions decoding."""
        from ..ops.initializers import apply_linear

        B = fc_feats.shape[0]
        xt = apply_linear(params["img_embed"], fc_feats)
        _, state = self._core(params, xt, self._zero_state(B), rng, deterministic)
        return EncodeOut(memory=None, state=state, reason_preds=[])

    def decode_logits(self, params, xt, memory, state, *, rng=None, deterministic=True):
        from ..ops.initializers import apply_linear

        h, state = self._core(params, xt, state, rng, deterministic)
        return apply_linear(params["logit"], h), state

    def decode_logprobs(self, params, xt, memory, state, *, rng=None, deterministic=True):
        logits, state = self.decode_logits(
            params, xt, memory, state, rng=rng, deterministic=deterministic
        )
        return jax.nn.log_softmax(logits.astype(jnp.float32)), state

    def forward(
        self, params, fc_feats, att_feats, seq, *, ss_prob=0.0, rng=None, deterministic=True
    ):
        """XE forward: (B, T_in) input tokens -> (B, T_in, V+1) logprobs.

        seq is the full label matrix (B, L+2); inputs are seq[:, :L+1]
        (column 0 = BOS), aligned with targets seq[:, 1:].
        """
        enc_rng, dec_rng = (None, None) if rng is None else jax.random.split(rng)
        enc = self.encode(params, fc_feats, att_feats, rng=enc_rng, deterministic=deterministic)
        seq_in = seq[:, : self.seq_length + 1]

        def step(xt, state, r):
            return self.decode_logprobs(
                params, xt, None, state, rng=r, deterministic=deterministic
            )

        lps = xe_decode(
            step,
            lambda toks: self.embed(params, toks),
            enc.state,
            seq_in,
            ss_prob=ss_prob,
            rng=dec_rng,
            vocab_size=self.vocab_size,
        )
        return lps, []
