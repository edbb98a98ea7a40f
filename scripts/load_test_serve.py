"""Serving ingest load test: asyncio vs threading front end.

Reproduces the PERF_NOTES.md §4f measurement: N keep-alive clients hammer
POST /caption on a tiny model (show_tell on synthetic features), isolating
HTTP ingest from device decode. Run on any host:

  python scripts/load_test_serve.py [--clients 64] [--seconds 8]

Prints one JSON line: {"asyncio_rps", "asyncio_errors", "threads_rps",
"threads_errors"}. r3 measurement on the build host: asyncio 1506 req/s,
threading 535 req/s, zero errors (64 clients, 8 s sustained).
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(port: int, body: str, n_clients: int, seconds: float):
    results = [None] * n_clients

    def hammer(idx):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        n, errs = 0, 0
        end = time.monotonic() + seconds
        while time.monotonic() < end:
            try:
                conn.request("POST", "/caption", body=body)
                r = conn.getresponse()
                r.read()
                if r.status == 200:
                    n += 1
                else:
                    errs += 1
            except Exception:
                errs += 1
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=60)
        results[idx] = (n, errs)

    threads = [threading.Thread(target=hammer, args=(i,))
               for i in range(n_clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0
    ok = sum(r[0] for r in results)
    errs = sum(r[1] for r in results)
    return ok / dt, errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--platform", default="",
                    help="force a jax backend (e.g. 'cpu' — ingest is "
                         "host-bound, so CPU isolates it from TPU load)")
    args = ap.parse_args()

    from recurrent_fusion_network_tpu.config import enable_compile_cache

    enable_compile_cache()
    import jax

    if args.platform:
        # env alone loses to the host sitecustomize's backend registration
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
    from recurrent_fusion_network_tpu.decoding.aio_serve import (
        run_server_async,
    )
    from recurrent_fusion_network_tpu.decoding.http_serve import (
        CaptionService,
        run_server,
    )
    from recurrent_fusion_network_tpu.models import setup

    opt, loader = synthetic_setup(caption_model="show_tell", batch_size=4)
    model = setup(opt)
    params = model.init_params(jax.random.PRNGKey(0))
    vocab = loader.get_vocab()
    b = loader.get_batch("val")
    body = json.dumps({
        "fc": [np.asarray(b["fc_feats"][0]).tolist()],
        "att": [np.asarray(b["att_feats"][0]).tolist()],
    })

    def warm(port):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        c.request("POST", "/caption", body=body)
        c.getresponse().read()
        c.close()

    svc = CaptionService(model, params, vocab, batch_size=64, beam_size=2,
                         depth=2, flush_interval=0.002)
    fe = run_server_async(svc, "127.0.0.1", 0)
    warm(fe.port)
    aio_rps, aio_errs = measure(fe.port, body, args.clients, args.seconds)
    print(f"# asyncio: {aio_rps:.0f} req/s ({aio_errs} errors)",
          file=sys.stderr)
    fe.stop()
    svc.close()

    svc2 = CaptionService(model, params, vocab, batch_size=64, beam_size=2,
                          depth=2, flush_interval=0.002)
    httpd = run_server(svc2, "127.0.0.1", 0)
    port2 = httpd.server_address[1]
    warm(port2)
    thr_rps, thr_errs = measure(port2, body, args.clients, args.seconds)
    print(f"# threads: {thr_rps:.0f} req/s ({thr_errs} errors)",
          file=sys.stderr)
    httpd.shutdown()
    svc2.close()

    print(json.dumps({
        "asyncio_rps": round(aio_rps), "asyncio_errors": aio_errs,
        "threads_rps": round(thr_rps), "threads_errors": thr_errs,
        "clients": args.clients, "seconds": args.seconds,
    }))


if __name__ == "__main__":
    main()
