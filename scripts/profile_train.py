"""Dissect the flagship XE train step into its roofline components.

VERDICT r3 item 1: BENCH_r03 measured the tied bf16 train step at 11.3
TFLOP/s against a 120 TFLOP/s same-session matmul probe (mfu_vs_demonstrated
0.094). This script answers WHERE the step time goes, on the real chip:

  * demonstrated ceilings: dense-matmul TFLOP/s probe + an HBM-bandwidth
    probe (chained elementwise passes), through the same backend/transport;
  * a null-dispatch probe (jitted scalar identity) so every phase can be
    read net of the tunnel's fixed per-dispatch cost;
  * phase bisection: forward loss only, forward+backward (grads), optimizer
    update only, full step — each its own normal-size jit (a K-step
    scanned mega-graph broke the remote-compile service; per-dispatch
    timing with the dispatch floor subtracted measures the same thing);
  * an analytic bytes-per-step model (params, grads, adam moments, casts)
    to compare against the HBM probe.

Usage: python scripts/profile_train.py [--rows 1024] [--dtype bfloat16]
       [--parity] [--no_remat] [--phases fwd,grad,opt,full]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/rfnet_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, readback, warmup=2, iters=5):
    for _ in range(warmup):
        readback(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        readback(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


def probe_dispatch(key):
    """Fixed per-dispatch cost: a jitted scalar op, timed to readback."""
    x = jax.random.normal(key, (8,))
    f = jax.jit(lambda x: (x * 1.0001).sum())
    sec, ts = timed(lambda: f(x), np.asarray, warmup=3, iters=7)
    return sec, ts


def probe_matmul(key, M=8192, K=8):
    a = jax.random.normal(key, (M, M)).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.fold_in(key, 1), (M, M)).astype(jnp.bfloat16)

    def chain(a, b):
        y = a
        for _ in range(K):
            y = jnp.tanh(y @ b)
        return y.astype(jnp.float32).mean()

    mm = jax.jit(chain)
    sec, _ = timed(lambda: mm(a, b), np.asarray, warmup=1, iters=3)
    return K * 2 * M**3 / sec / 1e12


def probe_hbm(key, bytes_target=4 << 30, K=8):
    """Demonstrated HBM bandwidth: K chained elementwise passes over a big
    f32 array inside one jit. optimization_barrier between passes keeps XLA
    from fusing the chain into a single read-once/write-once kernel (without
    it the probe overcounts bandwidth by ~K x — it measured 2160 GB/s on a
    chip whose datasheet is 819)."""
    n = bytes_target // 4
    x = jax.random.normal(key, (n,), jnp.float32)

    def chain(x):
        y = x
        for _ in range(K):
            y = jax.lax.optimization_barrier(y * 1.000001 + 0.5)
        return y.mean()

    f = jax.jit(chain)
    sec, _ = timed(lambda: f(x), np.asarray, warmup=1, iters=3)
    return K * 2 * bytes_target / sec / 1e9  # GB/s (read+write per pass)


def analyze(jitted, fargs):
    compiled = jitted.lower(*fargs).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0)) if ca else 0.0
    bytes_accessed = float(ca.get("bytes accessed", 0.0)) if ca else 0.0
    try:
        mem = compiled.memory_analysis()
        peak = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                + mem.output_size_in_bytes) / 2**30
    except Exception:
        peak = None
    return flops, bytes_accessed, peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1024)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--parity", action="store_true", help="untied keys")
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument("--phases", default="fwd,grad,opt,full")
    ap.add_argument("--remat_policy", default="save_ctx",
                    choices=("save_ctx", "full"),
                    help="A/B the remat residual policy")
    ap.add_argument("--mu_dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="adam first-moment dtype (HBM-traffic experiment)")
    args = ap.parse_args()

    import dataclasses

    import bench

    model = bench.flagship()
    if args.parity:
        model = dataclasses.replace(model, tied_att_keys=False)
    if not args.no_remat:
        model = dataclasses.replace(model, use_remat=True)
    model = dataclasses.replace(model, remat_policy=args.remat_policy)

    from recurrent_fusion_network_tpu.training.criterion import make_criterion
    from recurrent_fusion_network_tpu.training.eval_split import cast_tree
    from recurrent_fusion_network_tpu.training.optim import (apply_updates,
                                                             make_optimizer)
    from recurrent_fusion_network_tpu.training.train_loop import \
        make_train_step

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    opt = bench._flagship_options(model)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    crit = make_criterion(opt)
    tx = make_optimizer(opt)
    if args.mu_dtype == "bfloat16":
        # experiment arm: adam with a bf16 first moment (optax mu_dtype) —
        # halves the m read+write traffic (~1.7 GB/step at flagship dims)
        import optax

        tx = optax.chain(
            optax.clip(opt.grad_clip),
            optax.scale_by_adam(b1=opt.optim_adam_beta1,
                                b2=opt.optim_adam_beta2,
                                eps=opt.optim_epsilon,
                                mu_dtype=jnp.bfloat16),
        )
        report_mu = "bfloat16"
    else:
        report_mu = "float32"
    opt_state = tx.init(params)

    B = args.rows
    fcs, atts = bench.make_inputs(model, key, B, dt)
    L = model.seq_length + 2
    labels = jax.random.randint(key, (B, L), 0, model.vocab_size + 1)
    masks = jnp.ones((B, L), dt)
    top_words = jnp.full((B, model.top_words_count), -1, jnp.int32)
    top_words = top_words.at[:, 0].set(1)
    lr = jnp.float32(5e-4)
    rng = jax.random.PRNGKey(1)

    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree_util.tree_leaves(params))
    print(f"# params: {n_params/1e6:.1f} M ({n_params*4/2**30:.2f} GB f32)",
          flush=True)

    report = {"rows": B, "dtype": args.dtype,
              "tied": not args.parity, "remat": not args.no_remat,
              "remat_policy": args.remat_policy, "mu_dtype": report_mu,
              "n_params_m": round(n_params / 1e6, 1)}

    # ---- ceilings ----------------------------------------------------------
    disp_sec, disp_all = probe_dispatch(key)
    report["probe_dispatch_ms"] = round(disp_sec * 1e3, 1)
    report["probe_dispatch_ms_all"] = [round(t * 1e3, 1) for t in disp_all]
    report["probe_matmul_tflops"] = round(probe_matmul(key), 1)
    report["probe_hbm_gbps"] = round(probe_hbm(jax.random.fold_in(key, 7)), 1)
    print(f"# ceilings: dispatch {report['probe_dispatch_ms']} ms, matmul "
          f"{report['probe_matmul_tflops']} TFLOP/s, HBM "
          f"{report['probe_hbm_gbps']} GB/s", flush=True)

    # ---- phases ------------------------------------------------------------
    # batch data must be explicit jit ARGUMENTS: closed-over device arrays
    # become embedded constants that the remote-compile service hashes and
    # ingests — ~1.6 GB of feature constants wedged the forward compile for
    # 40+ minutes before this was made explicit
    def loss_fn(p, rng, fcs, atts, labels, masks, top_words):
        if dt is not jnp.float32:
            p = cast_tree(p, dt)
        lps, reason = model.forward(
            p, fcs, atts, labels, ss_prob=jnp.float32(0.0), rng=rng,
            deterministic=False)
        return crit(lps, labels, masks, reason, top_words)

    data_args = (fcs, atts, labels, masks, top_words)
    results = {}
    phases = set(args.phases.split(","))

    def record(name, jitted, fargs, run, readback):
        flops, ba, peak = analyze(jitted, fargs)
        sec, ts = timed(run, readback)
        net = max(sec - disp_sec, 1e-9)
        results[name] = {
            "wall_ms": round(sec * 1e3, 1),
            "wall_ms_all": [round(t * 1e3, 1) for t in ts],
            "net_ms": round(net * 1e3, 1),  # minus the dispatch floor
            "xla_tflop": round(flops / 1e12, 3),
            "xla_gb_accessed": round(ba / 2**30, 1) if ba else None,
            "net_tflops": round(flops / net / 1e12, 1) if flops else None,
            "net_gbps": round(ba / net / 1e9, 1) if ba else None,
            "peak_gb": round(peak, 2) if peak else None,
        }
        print(f"# {name}: {results[name]}", flush=True)

    if "fwd" in phases:
        fwd = jax.jit(loss_fn)
        record("forward", fwd, (params, rng) + data_args,
               lambda: fwd(params, rng, *data_args), np.asarray)

    if "grad" in phases:
        # the grads must be RETURNED: dropping them ([0]) let XLA dead-code
        # the whole backward — the phase measured bit-identical to forward
        # (wall/flops/bytes all equal) before this fix. Readback barrier is
        # the loss; the grad tree materializes as jit outputs regardless.
        vg_loss = jax.jit(lambda p, r, *d: jax.value_and_grad(loss_fn)(p, r, *d))
        record("forward_backward", vg_loss, (params, rng) + data_args,
               lambda: vg_loss(params, rng, *data_args),
               lambda out: np.asarray(out[0]))

    if "opt" in phases:
        grads_fixed = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, 1e-4), params)

        # the update must be returned IN FULL: adam is elementwise, so any
        # scalar fingerprint lets XLA slice the whole 13 GB update down to
        # a few elements (the first version measured net_ms 2.4 with
        # xla_gb_accessed 0.0 — pure DCE). Donated buffers make it the
        # same in-place update the real train step runs; the scalar rider
        # is the readback barrier.
        def opt_step(g, o, p):
            d, o2 = tx.update(g, o, p)
            p2 = apply_updates(p, d, lr)
            fp = (jax.tree_util.tree_leaves(p2)[0].ravel()[0]
                  + jax.tree_util.tree_leaves(o2)[0].ravel()[0])
            return p2, o2, fp

        jopt = jax.jit(opt_step, donate_argnums=(1, 2))
        ostate = {"o": opt_state, "p": params}

        def run_opt():
            p2, o2, fp = jopt(grads_fixed, ostate["o"], ostate["p"])
            ostate["o"], ostate["p"] = o2, p2
            return fp

        record("optimizer", jopt, (grads_fixed, opt_state, params),
               run_opt, np.asarray)
        # restore undonated copies for any later phase
        params = ostate["p"]
        opt_state = ostate["o"]

    if "full" in phases:
        step = make_train_step(model, crit, tx, None,
                               compute_dtype=None if dt is jnp.float32 else dt)
        state = {"p": params, "o": opt_state}

        def run():
            p, o, l = step(state["p"], state["o"], fcs, atts, labels, masks,
                           top_words, lr, jnp.float32(0.0), rng)
            state["p"], state["o"] = p, o
            return l

        flops, ba, peak = analyze(
            step, (params, opt_state, fcs, atts, labels, masks, top_words,
                   lr, jnp.float32(0.0), rng))
        sec, ts = timed(run, np.asarray)
        net = max(sec - disp_sec, 1e-9)
        results["full_step"] = {
            "wall_ms": round(sec * 1e3, 1),
            "wall_ms_all": [round(t * 1e3, 1) for t in ts],
            "net_ms": round(net * 1e3, 1),
            "xla_tflop": round(flops / 1e12, 3),
            "xla_gb_accessed": round(ba / 2**30, 1) if ba else None,
            "net_tflops": round(flops / net / 1e12, 1) if flops else None,
            "net_gbps": round(ba / net / 1e9, 1) if ba else None,
            "peak_gb": round(peak, 2) if peak else None,
        }
        print(f"# full_step: {results['full_step']}", flush=True)

    # ---- analytic bytes model ----------------------------------------------
    pbytes = n_params * 4
    cast = n_params * 2 if dt is jnp.bfloat16 else 0
    weight_reads = (cast or pbytes) * (3 if not args.no_remat else 2)
    model_bytes = pbytes + cast + weight_reads + pbytes  # f32 read+cast+grads
    opt_bytes = pbytes * 4 + pbytes * 3 + pbytes * 2  # r: g,m,v,p; w: m,v,p; dir
    total_gb = (model_bytes + opt_bytes) / 2**30
    report["analytic_min_bytes_gb"] = round(total_gb, 1)
    report["analytic_hbm_floor_ms"] = round(
        total_gb * 2**30 / (report["probe_hbm_gbps"] * 1e9) * 1e3, 1)
    if "full_step" in results:
        report["compute_floor_ms"] = round(
            results["full_step"]["xla_tflop"]
            / report["probe_matmul_tflops"] * 1e3, 1)
    report["phases"] = results
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
