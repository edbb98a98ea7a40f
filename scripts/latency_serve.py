"""Serving latency percentiles on the real chip (PERF_NOTES §4f companion).

VERDICT r3 item 7: the perf notes had serving THROUGHPUT (pipelined batch
rate, HTTP ingest req/s) but no request-latency distribution. This measures
p50/p90/p99 per-request latency through CaptionServer (the production
batching path) on the flagship RecurrentFusionModel, beam 3, bf16:

  * N concurrent closed-loop clients (each submits one image, waits, then
    submits the next) for N in {1, 8, 64};
  * batched mode (batch_size 64, requests coalesce into device batches,
    depth-2 pipeline) vs solo mode (batch_size 1 — every request decodes
    alone, the reference's per-image regime).

Usage: python scripts/latency_serve.py [--clients 1,8,64] [--seconds 20]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recurrent_fusion_network_tpu.config import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def percentiles(lat):
    lat = np.asarray(lat) * 1e3
    return {
        "n": int(lat.size),
        "p50_ms": round(float(np.percentile(lat, 50)), 1),
        "p90_ms": round(float(np.percentile(lat, 90)), 1),
        "p99_ms": round(float(np.percentile(lat, 99)), 1),
        "max_ms": round(float(lat.max()), 1),
    }


def run_clients(server, feats, n_clients, seconds):
    lats = [[] for _ in range(n_clients)]
    stop = time.monotonic() + seconds

    def client(idx):
        fcs, atts = feats
        while time.monotonic() < stop:
            t0 = time.perf_counter()
            fut = server.submit(fcs, atts)
            fut.result(timeout=300)
            lats[idx].append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    flat = [x for l in lats for x in l]
    out = percentiles(flat)
    out["throughput_rps"] = round(len(flat) / seconds, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", default="1,8,64")
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--beam", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import bench

    from recurrent_fusion_network_tpu.decoding.api import model_sample
    from recurrent_fusion_network_tpu.decoding.serve import CaptionServer
    from recurrent_fusion_network_tpu.training.eval_split import cast_tree

    model = bench.flagship()
    key = jax.random.PRNGKey(0)
    params = cast_tree(model.init_params(key), jnp.bfloat16)

    # params as an explicit jit arg (closing over them embeds ~1.8 GB of
    # constants in the remote-compile payload — the service rejects it with
    # HTTP 413)
    params = jax.device_put(params)
    jd_inner = jax.jit(
        lambda p, fcs, atts: model_sample(model, p, fcs, atts,
                                          beam_size=args.beam)
    )
    jd = lambda fcs, atts: jd_inner(params, fcs, atts)

    rng = np.random.default_rng(0)
    feats = (
        [rng.standard_normal(d).astype(np.float32)
         for d in model.fc_feat_sizes],
        [rng.standard_normal((n, d)).astype(np.float32)
         for n, d in zip(model.att_nums, model.att_feat_sizes)],
    )

    client_counts = [int(c) for c in args.clients.split(",")]
    result = {"model": "flagship_tied", "beam": args.beam,
              "batch_size": args.batch, "seconds": args.seconds,
              "device_kind": jax.devices()[0].device_kind, "modes": {}}

    for mode, bsz in (("batched", args.batch), ("solo", 1)):
        # cast_dtype bf16: requests upload half the bytes and the decode
        # graph matches the bench's bf16-input graph; device_pad (default)
        # keeps a partial batch's H2D payload proportional to real rows
        server = CaptionServer(jd, bsz, depth=2, flush_interval=0.002,
                               cast_dtype=jnp.bfloat16)
        # warm/compile this batch shape before timing (a cold remote-compile
        # of the flagship beam graph has measured >20 min — bound generously)
        server.submit(*feats).result(timeout=3600)
        per_n = {}
        for n in client_counts:
            per_n[f"clients_{n}"] = run_clients(server, feats, n,
                                                args.seconds)
            print(f"# {mode} x{n}: {per_n[f'clients_{n}']}", file=sys.stderr)
        server.close()
        result["modes"][mode] = per_n

    print(json.dumps(result))


if __name__ == "__main__":
    main()
