"""Decode-path profiling: where does a flagship beam-3 batch spend its time?

Breaks the `model_sample` graph into encode (review stages), decode loop, and
single-step cost, each timed to host-readback on the real backend, plus
kernel-on vs kernel-off (--use_pallas) comparisons. This is the measurement
the Pallas investment decision rides on (ROADMAP: perf).

Usage: python scripts/profile_decode.py [B] [BEAM]
"""

from __future__ import annotations

import sys
import time

from recurrent_fusion_network_tpu.config import enable_compile_cache

enable_compile_cache()  # flagship graphs take minutes on remote-compile hosts
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rfnet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(tag, fn, readback, iters=5, warmup=2):
    for _ in range(warmup):
        readback(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        readback(fn())
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"{tag:<42s} {ms:9.2f} ms")
    return ms


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    BEAM = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from recurrent_fusion_network_tpu.decoding.api import model_sample
    from recurrent_fusion_network_tpu.decoding.beam import beam_search
    from recurrent_fusion_network_tpu.decoding.engine import make_step_fn
    from recurrent_fusion_network_tpu.models import RecurrentFusionModel
    from recurrent_fusion_network_tpu.training.eval_split import cast_tree

    dt = jnp.bfloat16
    model_kw = dict(
        vocab_size=9487,
        seq_length=16,
        fc_feat_sizes=(2048, 1536, 2048, 2208, 1536),
        att_feat_sizes=(2048, 1536, 1280, 2208, 1536),
        att_nums=(196, 64, 64, 49, 64),
        rnn_size=512,
        input_encoding_size=512,
        att_hid_size=512,
        num_review_steps=8,
        num_review_steps_0=8,
        top_words_count=1000,
    )
    model = RecurrentFusionModel(**model_kw)
    key = jax.random.PRNGKey(0)
    params = cast_tree(model.init_params(key), dt)
    fcs = [
        jax.random.normal(jax.random.fold_in(key, i), (B, d)).astype(dt)
        for i, d in enumerate(model.fc_feat_sizes)
    ]
    atts = [
        jax.random.normal(jax.random.fold_in(key, 10 + i), (B, n, d)).astype(dt)
        for i, (n, d) in enumerate(zip(model.att_nums, model.att_feat_sizes))
    ]

    print(f"B={B} beam={BEAM} bf16  (times are medians of 5, host-readback)")

    # 1. full pipeline
    full = jax.jit(lambda p, f, a: model_sample(model, p, f, a, beam_size=BEAM))
    t_full = timed("full model_sample (encode+beam)", lambda: full(params, fcs, atts),
                   lambda o: np.asarray(o.seq))

    # 2. encode only
    enc_fn = jax.jit(lambda p, f, a: model.encode(p, f, a))
    t_enc = timed("encode (review I+II)", lambda: enc_fn(params, fcs, atts),
                  lambda o: np.asarray(o.state[0]))

    # 3. beam decode only (encode held fixed)
    enc = jax.device_get(enc_fn(params, fcs, atts))
    enc = jax.device_put(enc)

    @jax.jit
    def decode_only(params, enc):
        step = make_step_fn(model, params, enc.memory)
        return beam_search(step, enc.state, B, BEAM, model.seq_length,
                           model.vocab_size + 1)

    t_dec = timed("beam decode only (17-step scan)",
                  lambda: decode_only(params, enc), lambda o: np.asarray(o.seq))

    # 4. one decode step (expanded to beam lanes), isolated
    N = B * BEAM
    toks = jnp.zeros((N,), jnp.int32)
    state_l = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, BEAM, axis=0), enc.state)
    mem_l = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, BEAM, axis=0), enc.memory)

    @jax.jit
    def one_step(params, toks, state, mem):
        step = make_step_fn(model, params, mem)
        return step(toks, state)

    t_step = timed("single decode step (embed+cell+logit)",
                   lambda: one_step(params, toks, state_l, mem_l),
                   lambda o: np.asarray(o[0][:1, :1]))

    # 5. logit matmul alone at lane width
    h = state_l[0]
    w, b = params["logit"]["w"], params["logit"]["b"]
    logit_fn = jax.jit(lambda h, w, b: jax.nn.log_softmax(
        (h @ w + b).astype(jnp.float32)))
    t_logit = timed("logit matmul + log_softmax",
                    lambda: logit_fn(h, w, b), lambda o: np.asarray(o[:1, :1]))

    # 6. kernel-on variant if available
    model_p = RecurrentFusionModel(**model_kw, use_pallas=True)
    full_p = jax.jit(lambda p, f, a: model_sample(model_p, p, f, a, beam_size=BEAM))
    t_full_p = timed("full model_sample (--use_pallas)",
                     lambda: full_p(params, fcs, atts), lambda o: np.asarray(o.seq))

    print(f"\nsummary: full={t_full:.1f} enc={t_enc:.1f} dec={t_dec:.1f} "
          f"step×17={17 * t_step:.1f} logit×17={17 * t_logit:.1f} "
          f"pallas_full={t_full_p:.1f}")
    print(f"captions/s: off={B / t_full * 1e3:.0f} on={B / t_full_p * 1e3:.0f}")


if __name__ == "__main__":
    main()
