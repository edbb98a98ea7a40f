"""Caption-serving entry point: an HTTP service over a trained checkpoint.

TPU-native addition (the reference has no serving path): concurrent HTTP
requests are coalesced into static-shape device batches by CaptionServer,
so the service runs at the batched-pipelined decode rate regardless of how
requests arrive (see decoding/http_serve.py and PERF_NOTES.md §4b).

  python serve.py --model_path checkpoint --load_model_id myrun \
      --port 8080 --serve_batch_size 16 --beam_size 3
  # raw-image mode (adds POST /caption_image):
  python serve.py ... --backbone_weights resnet101.pth --backbone_arch resnet101

  curl localhost:8080/healthz
  curl -X POST localhost:8080/caption -d '{"fc": [[...]], "att": [[[...]]]}'
  curl -X POST localhost:8080/caption_image --data-binary @img.jpg
"""

from __future__ import annotations

import argparse


def main(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--port", type=int, default=8080)
    pre.add_argument("--host", default="0.0.0.0")
    pre.add_argument("--serve_batch_size", type=int, default=16)
    pre.add_argument("--serve_depth", type=int, default=2)
    pre.add_argument("--drain_timeout", type=float, default=30.0,
                     help="graceful-shutdown wait (s) for in-flight "
                          "requests after SIGTERM/SIGINT")
    pre.add_argument("--serve_dp_devices", type=int, default=1,
                     help="shard each decode batch over an N-device 'dp' "
                          "mesh (one server feeds a whole slice; "
                          "serve_batch_size must divide by N)")
    pre.add_argument("--serve_frontend", default="asyncio",
                     choices=("asyncio", "threads"),
                     help="asyncio: single-loop keep-alive ingest (>1k "
                          "req/s); threads: stdlib ThreadingHTTPServer "
                          "(~270 req/s, required for /caption_image)")
    pre.add_argument("--rl_prefix", type=int, default=0,
                     help="serve the rl_-prefixed (SCST) checkpoint — RL "
                          "training only ever writes rl_ files, so the RL "
                          "deliverable is unservable without this")
    pre.add_argument("--rank", type=int, default=0,
                     help="checkpoint rank (fleet seed index)")
    pre.add_argument("--serve_dtype", default="bfloat16",
                     choices=("bfloat16", "float32"),
                     help="decode compute dtype: bfloat16 (default; the "
                          "TPU-native profile — caption-identical to f32 "
                          "on trained models and half the request H2D "
                          "payload) or float32")
    pre_args, rest = pre.parse_known_args(argv)

    from recurrent_fusion_network_tpu.config import parse_opt
    from recurrent_fusion_network_tpu.decoding.http_serve import (
        CaptionService,
        run_server,
    )
    from recurrent_fusion_network_tpu.models import setup
    from recurrent_fusion_network_tpu.training import checkpoint

    from eval import merge_checkpoint_opt

    opt = parse_opt(rest)
    ckpt_dir = opt.model_path or opt.checkpoint_path
    # honor --checkpoint_backend: a checkpoint written with the orbax backend
    # must be servable too, so resolve the loader through backend(opt)
    ckpt = checkpoint.backend(opt)
    params, _, infos = ckpt.load_checkpoint(
        ckpt_dir, opt.load_model_id, pre_args.rank, best=True,
        prefix="rl_" if pre_args.rl_prefix else "",
    )
    if "opt" in infos:
        merge_checkpoint_opt(opt, infos["opt"])
    vocab = infos.get("vocab")
    assert vocab, "checkpoint infos missing vocab"
    opt.vocab_size = len(vocab)
    opt.seq_length = infos.get("opt", {}).get("seq_length") or 16
    model = setup(opt)

    backbone = None
    if getattr(opt, "backbone_weights", ""):
        from recurrent_fusion_network_tpu.data.feature_extraction.backbones import (
            build_backbone,
        )

        bb_params, feats_fn, _, _ = build_backbone(
            opt.backbone_arch, 14, opt.backbone_weights
        )
        backbone = (bb_params, feats_fn, 448)

    if pre_args.serve_dtype == "bfloat16":
        import jax.numpy as jnp

        from recurrent_fusion_network_tpu.training.eval_split import cast_tree

        params = cast_tree(params, jnp.bfloat16)

    mesh = None
    if pre_args.serve_dp_devices > 1:
        from recurrent_fusion_network_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(pre_args.serve_dp_devices)
    service = CaptionService(
        model, params, vocab,
        batch_size=pre_args.serve_batch_size,
        beam_size=opt.beam_size,
        depth=pre_args.serve_depth,
        backbone=backbone,
        mesh=mesh,
    )
    # graceful shutdown: SIGTERM (preemption/rollout) and SIGINT both stop
    # the listener, drain in-flight requests, flush the device pipeline,
    # and exit 0 — same discipline as the training loops' PreemptGuard.
    # Installed BEFORE the (potentially minutes-long) warmup compile, so a
    # preemption during warmup still produces a clean exit 0 instead of an
    # abrupt 143 an orchestrator would classify as a crash.
    import signal
    import threading

    stop = threading.Event()
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: stop.set())

    # compile the decode graph BEFORE announcing ready: through
    # remote-compile backends the first decode costs minutes, which would
    # otherwise land on the first live request (and outlive a drain window)
    print("warming up the decode graph...", flush=True)
    service.warmup()
    if stop.is_set():
        print("signal during warmup — exiting before serving", flush=True)
        service.close()
        print("shutdown complete", flush=True)
        return

    frontend = pre_args.serve_frontend
    if backbone is not None and frontend == "asyncio":
        # /caption_image does blocking PIL decode; keep it off the loop
        print("--backbone_weights set: using the threading front end "
              "(/caption_image support)")
        frontend = "threads"
    if frontend == "asyncio":
        from recurrent_fusion_network_tpu.decoding.aio_serve import (
            run_server_async,
        )

        fe = run_server_async(service, pre_args.host, pre_args.port)
        print(f"caption service (asyncio) on {pre_args.host}:{fe.port} "
              f"(batch {pre_args.serve_batch_size}, beam {opt.beam_size})",
              flush=True)
        stop.wait()
        print("shutting down: draining in-flight requests", flush=True)
        fe.stop(drain=True, timeout=pre_args.drain_timeout)
        service.close()
        print("shutdown complete", flush=True)
        return
    httpd = run_server(service, pre_args.host, pre_args.port)
    print(f"caption service on {pre_args.host}:{pre_args.port} "
          f"(batch {pre_args.serve_batch_size}, beam {opt.beam_size}, "
          f"image mode {'on' if backbone else 'off'})", flush=True)
    stop.wait()
    print("shutting down: draining in-flight requests", flush=True)
    httpd.shutdown()  # stop accepting; active handler threads continue
    service.close()  # drains queued + in-flight device batches, resolving
    # the futures the handler threads are blocked on
    # server_close() releases the listener socket. Handler threads are
    # daemons (stdlib never tracks daemon threads for the block_on_close
    # join), and service.close() above already resolved every in-flight
    # future, so responses for live requests are written by now. Run the
    # close on a bounded side thread anyway: if daemon_threads ever flips,
    # a client stalled mid-read must not hold shutdown past
    # --drain_timeout (SIGKILL from the supervisor would record a crash
    # instead of this clean exit).
    import threading as _threading

    closer = _threading.Thread(target=httpd.server_close, daemon=True)
    closer.start()
    closer.join(pre_args.drain_timeout)
    if closer.is_alive():
        print("drain timeout: abandoning stalled handler thread(s)",
              flush=True)
    print("shutdown complete", flush=True)


if __name__ == "__main__":
    main()
