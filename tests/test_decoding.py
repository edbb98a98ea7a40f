"""Decoding-engine tests.

The batched `lax.scan`+top_k beam search is validated token-for-token against
a NumPy re-implementation of the reference's per-image beam loop semantics
(misc/RecurrentFusionModel.py:451-541): candidate enumeration over each live
beam's top-K tokens, dead-beam skipping, done-beam collection on EOS/length,
and best-done-beam selection. Both drive the same deterministic fake decoder
(a hashed-state logit machine), so any semantic divergence shows up as a
token mismatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_fusion_network_tpu.decoding import beam_search, make_step_fn, sample
from recurrent_fusion_network_tpu.decoding.api import model_sample
from recurrent_fusion_network_tpu.models import ShowTellModel

S, V = 37, 9  # hashed-machine state count, vocab width (incl. token 0)


def make_machine(seed, peaky=False):
    g = np.random.default_rng(seed)
    logits = g.standard_normal((S, V)).astype(np.float32)
    if peaky:
        logits *= 3.0
    W = logits - np.log(np.exp(logits).sum(-1, keepdims=True))  # log_softmax
    return W


def np_step(W, tokens, state):
    new_state = (state * 31 + tokens) % S
    return W[new_state], new_state


def jax_step(W):
    Wj = jnp.asarray(W)

    def step(tokens, state):
        new_state = (state * 31 + tokens.astype(state.dtype)) % S
        return Wj[new_state], new_state

    return step


def np_beam_reference(W, init_state, K, L):
    """Executable spec of the reference per-image beam loop."""
    beam_seq = np.zeros((L, K), dtype=int)
    beam_lps = np.zeros((L, K))
    beam_sum = np.zeros(K)
    done = []
    state = np.full(K, init_state, dtype=np.int64)
    logprobs = None
    for t in range(L + 1):
        if t == 0:
            it = np.zeros(K, dtype=int)
        else:
            ix = np.argsort(-logprobs, axis=1, kind="stable")
            ys = np.take_along_axis(logprobs, ix, axis=1)
            cols = min(K, V)
            rows = K if t > 1 else 1
            candidates = []
            for c in range(cols):
                for q in range(rows):
                    if t > 1 and beam_seq[t - 2, q] == 0:
                        continue
                    local = ys[q, c]
                    candidates.append(
                        dict(c=int(ix[q, c]), q=q, p=beam_sum[q] + local, r=local)
                    )
            if not candidates:
                break
            candidates.sort(key=lambda x: -x["p"])
            new_state = state.copy()
            if t > 1:
                seq_prev = beam_seq[: t - 1].copy()
                lps_prev = beam_lps[: t - 1].copy()
            for vix in range(min(K, len(candidates))):
                v = candidates[vix]
                if t > 1:
                    beam_seq[: t - 1, vix] = seq_prev[:, v["q"]]
                    beam_lps[: t - 1, vix] = lps_prev[:, v["q"]]
                new_state[vix] = state[v["q"]]
                beam_seq[t - 1, vix] = v["c"]
                beam_lps[t - 1, vix] = v["r"]
                beam_sum[vix] = v["p"]
                if v["c"] == 0 or t == L:
                    done.append(
                        dict(
                            seq=beam_seq[:, vix].copy(),
                            logps=beam_lps[:, vix].copy(),
                            p=float(beam_sum[vix]),
                        )
                    )
            it = beam_seq[t - 1].copy()
            state = new_state
        logprobs, state = np_step(W, it, state)
    done.sort(key=lambda x: -x["p"])
    return done


class TestBeamParity:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("peaky", [False, True])
    def test_matches_reference_semantics(self, seed, peaky):
        K, L, B = 3, 7, 4
        W = make_machine(seed, peaky)
        init_states = np.arange(B, dtype=np.int64) + 1

        # batched engine: carry = hashed state per lane
        carry = jnp.asarray(init_states)
        out = beam_search(jax_step(W), carry, B, K, L, V)

        for b in range(B):
            done = np_beam_reference(W, init_states[b], K, L)
            assert len(done) >= 1
            np.testing.assert_allclose(
                float(out.top_p[b, 0]), done[0]["p"], rtol=1e-5,
                err_msg=f"best-p mismatch image {b}",
            )
            np.testing.assert_array_equal(
                np.asarray(out.seq[b]), done[0]["seq"],
                err_msg=f"best-seq mismatch image {b}",
            )
            np.testing.assert_allclose(
                np.asarray(out.seq_logprobs[b]), done[0]["logps"], rtol=1e-5
            )
            # top-K done scores agree (up to available done count)
            n = min(K, len(done))
            np.testing.assert_allclose(
                np.asarray(out.top_p[b, :n]),
                [d["p"] for d in done[:n]],
                rtol=1e-5,
            )

    def test_beam_is_jittable(self):
        K, L, B = 3, 5, 2
        W = make_machine(7)
        f = jax.jit(
            lambda c: beam_search(jax_step(W), c, B, K, L, V), static_argnums=()
        )
        out = f(jnp.asarray([1, 2]))
        assert out.seq.shape == (B, L)
        assert out.top_p.shape == (B, K)


class TestSampleParity:
    def test_greedy_matches_numpy_rollout(self):
        B, L = 5, 8
        W = make_machine(11)
        init = np.arange(B, dtype=np.int64) + 3
        out = sample(jax_step(W), jnp.asarray(init), B, L, V, sample_max=True)

        # numpy greedy spec (misc/RecurrentFusionModel.py:616-653)
        state = init.copy()
        logprobs, state = np_step(W, np.zeros(B, dtype=int), state)
        seq = np.zeros((B, L), dtype=int)
        lps = np.zeros((B, L))
        unfinished = np.ones(B, dtype=bool)
        for t in range(1, L + 1):
            it = np.argmax(logprobs, 1)
            samp = logprobs[np.arange(B), it]
            if t == 1:
                unfinished = it > 0
            else:
                unfinished = unfinished & (it > 0)
            seq[:, t - 1] = it * unfinished
            lps[:, t - 1] = samp
            logprobs, state = np_step(W, it, state)  # embeds raw token
        np.testing.assert_array_equal(np.asarray(out.seq), seq)
        np.testing.assert_allclose(np.asarray(out.seq_logprobs), lps, rtol=1e-5)

    def test_multinomial_reproducible_and_masked(self):
        B, L = 4, 6
        W = make_machine(13)
        init = jnp.asarray(np.arange(B, dtype=np.int64))
        r = jax.random.PRNGKey(0)
        o1 = sample(jax_step(W), init, B, L, V, sample_max=False, rng=r)
        o2 = sample(jax_step(W), init, B, L, V, sample_max=False, rng=r)
        np.testing.assert_array_equal(np.asarray(o1.seq), np.asarray(o2.seq))
        # once a row hits 0 it stays 0
        s = np.asarray(o1.seq)
        for b in range(B):
            z = np.where(s[b] == 0)[0]
            if len(z):
                assert (s[b, z[0]:] == 0).all()
        assert o1.logprobs_all.shape == (B, L + 1, V)

    def test_batch_finished_tail_is_zero(self):
        """Once EVERY row has finished, nothing further is recorded (the
        reference breaks out of the loop, misc/RecurrentFusionModel.py:645-646,
        so its padded outputs have a zero tail) — but while ANY row is still
        alive, finished rows' phantom draws ARE recorded (the reference
        appends sampleLogprobs for the whole batch each non-broken step)."""
        B, L = 2, 6

        def count_step(tokens, counter):
            # counter c: the lp table consumed at draw step t = c + 1
            lp = jnp.full((B, V), -5.0)
            eos_now = counter >= 1  # favor EOS from the second draw on
            fav = jnp.where(eos_now, 0, 3)
            lp = lp.at[jnp.arange(B), fav].set(-0.1)
            return lp, counter + 1

        out = sample(count_step, jnp.zeros((), jnp.int32), B, L, V)
        s, lp = np.asarray(out.seq), np.asarray(out.seq_logprobs)
        np.testing.assert_array_equal(s, [[3, 0, 0, 0, 0, 0]] * B)
        assert (lp[:, 0] != 0).all()  # first token's logprob
        assert (lp[:, 1] != 0).all()  # the collective-EOS step is recorded
        np.testing.assert_array_equal(lp[:, 2:], 0.0)  # post-break tail

        def mixed_step(tokens, counter):
            # row 0 finishes at the 2nd draw; row 1 never emits EOS
            lp = jnp.full((B, V), -5.0)
            fav = jnp.where(
                jnp.logical_and(jnp.arange(B) == 0, counter >= 1), 0, 3
            )
            lp = lp.at[jnp.arange(B), fav].set(-0.1)
            return lp, counter + 1

        out = sample(mixed_step, jnp.zeros((), jnp.int32), B, L, V)
        s, lp = np.asarray(out.seq), np.asarray(out.seq_logprobs)
        np.testing.assert_array_equal(s[0], [3, 0, 0, 0, 0, 0])
        assert (s[1] == 3).all()
        # row 0's phantom draws stay recorded while row 1 is alive
        assert (lp[0, 2:] != 0).all()


class TestModelDecode:
    def _model_and_params(self):
        m = ShowTellModel(
            vocab_size=20, seq_length=6, input_encoding_size=8, rnn_size=8,
            fc_feat_size=10,
        )
        p = m.init_params(jax.random.PRNGKey(0))
        fc = jax.random.normal(jax.random.PRNGKey(1), (3, 10))
        return m, p, fc

    def test_greedy_and_beam_shapes(self):
        m, p, fc = self._model_and_params()
        g = model_sample(m, p, fc, None, beam_size=1)
        assert g.seq.shape == (3, 6) and g.logprobs_all.shape == (3, 7, 21)
        b = model_sample(m, p, fc, None, beam_size=3)
        assert b.seq.shape == (3, 6) and b.top_seq.shape == (3, 3, 6)
        assert b.top_p.shape == (3, 3)
        # beams sorted by accumulated logprob
        tp = np.asarray(b.top_p)
        assert (np.diff(tp, axis=1) <= 1e-6).all()

    def test_beam_best_at_least_greedy(self):
        """The best beam's accumulated logprob must be >= the greedy rollout's
        (beam search explores a superset)."""
        m, p, fc = self._model_and_params()
        g = model_sample(m, p, fc, None, beam_size=1)
        b = model_sample(m, p, fc, None, beam_size=3)
        g_seq = np.asarray(g.seq)
        g_lp = np.asarray(g.seq_logprobs)
        for i in range(3):
            # greedy accumulated logprob over emitted tokens + EOS step
            alive = np.ones(6, bool)
            z = np.where(g_seq[i] == 0)[0]
            score = g_lp[i, : (z[0] + 1 if len(z) else 6)].sum()
            assert float(b.top_p[i, 0]) >= score - 1e-4


class TestBeamAdversarial:
    """Fuzz the batched beam engine against the NumPy reference spec on
    degenerate decoders: EOS-dominant (most beams die immediately), and
    near-tie logit tables."""

    def _compare(self, W, K, L, B=3):
        init_states = np.arange(B, dtype=np.int64) + 1
        out = beam_search(jax_step(W), jnp.asarray(init_states), B, K, L, V)
        for b in range(B):
            done = np_beam_reference(W, init_states[b], K, L)
            np.testing.assert_allclose(
                float(out.top_p[b, 0]), done[0]["p"], rtol=1e-5)
            np.testing.assert_array_equal(np.asarray(out.seq[b]), done[0]["seq"])

    def test_eos_dominant_machine(self):
        """Token 0 carries most probability mass: beams finish at step 1-2
        and the done-set bookkeeping dominates."""
        g = np.random.default_rng(21)
        logits = g.standard_normal((S, V)).astype(np.float32)
        logits[:, 0] += 3.0  # EOS strongly favored everywhere
        W = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        self._compare(W, K=3, L=6)

    def test_eos_suppressed_machine(self):
        """EOS almost never sampled: every beam runs to the length cutoff."""
        g = np.random.default_rng(22)
        logits = g.standard_normal((S, V)).astype(np.float32)
        logits[:, 0] -= 10.0
        W = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        self._compare(W, K=4, L=5)

    def test_wide_beam_equals_vocab(self):
        """beam_size == vocab width (the reference's assert boundary)."""
        g = np.random.default_rng(23)
        logits = g.standard_normal((S, V)).astype(np.float32)
        W = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        self._compare(W, K=V, L=4)

    def test_beam_one_matches_greedy(self):
        """K=1 beam must follow the greedy path until EOS."""
        W = make_machine(24)
        B, L = 4, 6
        init = np.arange(B, dtype=np.int64)
        b1 = beam_search(jax_step(W), jnp.asarray(init), B, 1, L, V)
        gr = sample(jax_step(W), jnp.asarray(init), B, L, V, sample_max=True)
        # identical until (and including) the first EOS position
        for i in range(B):
            bs, gs = np.asarray(b1.seq[i]), np.asarray(gr.seq[i])
            for a, c in zip(bs, gs):
                assert a == c
                if a == 0:
                    break

    def test_exact_tie_tables(self):
        """All-equal logits: every candidate score ties at every step, so the
        result is pure tie-breaking; the batched engine must keep the same
        best-score as the reference's stable column-major candidate sort."""
        W = np.full((S, V), -np.log(V), dtype=np.float32)
        init_states = np.arange(3, dtype=np.int64) + 1
        out = beam_search(jax_step(W), jnp.asarray(init_states), 3, 3, 5, V)
        for b in range(3):
            done = np_beam_reference(W, init_states[b], 3, 5)
            np.testing.assert_allclose(float(out.top_p[b, 0]), done[0]["p"],
                                       rtol=1e-6)

    def test_two_way_tie_blocks(self):
        """Pairs of tokens share identical log-probs (partial ties)."""
        g = np.random.default_rng(31)
        logits = g.standard_normal((S, (V + 1) // 2)).astype(np.float32)
        logits = np.repeat(logits, 2, axis=1)[:, :V]  # duplicate columns
        W = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        init_states = np.arange(4, dtype=np.int64)
        out = beam_search(jax_step(W), jnp.asarray(init_states), 4, 3, 6, V)
        for b in range(4):
            done = np_beam_reference(W, init_states[b], 3, 6)
            np.testing.assert_allclose(float(out.top_p[b, 0]), done[0]["p"],
                                       rtol=1e-5)

    def test_single_real_token_vocab(self):
        """Vocab of {EOS, one word}: beams can only extend with token 1 or
        die; done-set handling at the K > usable-candidates boundary."""

        def machine(eos_bias):
            logits = np.zeros((S, 2), dtype=np.float32)
            logits[:, 0] += eos_bias
            return (logits - np.log(np.exp(logits).sum(-1, keepdims=True))
                    ).astype(np.float32)

        for eos_bias in (-4.0, 0.0, 2.0):
            W = machine(eos_bias)
            init_states = np.arange(2, dtype=np.int64) + 3
            out = beam_search(jax_step(W), jnp.asarray(init_states), 2, 2, 4,
                              2)
            for b in range(2):
                done = np_beam_reference(W, init_states[b], 2, 4)
                np.testing.assert_allclose(
                    float(out.top_p[b, 0]), done[0]["p"], rtol=1e-5,
                    err_msg=f"eos_bias={eos_bias}",
                )
                np.testing.assert_array_equal(np.asarray(out.seq[b]),
                                              done[0]["seq"])

    @pytest.mark.parametrize("seed", range(25, 45))
    def test_randomized_sweep(self, seed):
        """20-seed randomized fuzz over (K, L, peakiness) against the spec."""
        g = np.random.default_rng(seed)
        K = int(g.integers(1, V + 1))
        L = int(g.integers(2, 9))
        scale = float(g.uniform(0.3, 4.0))
        logits = g.standard_normal((S, V)).astype(np.float32) * scale
        W = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        self._compare(W, K=K, L=L)
