"""Pipelined serving tests (decoding/serve.py)."""

import json
import time
from concurrent.futures import Future

import numpy as np
import pytest

pytestmark = pytest.mark.quick

import jax
import jax.numpy as jnp

from recurrent_fusion_network_tpu.decoding.serve import (
    CaptionServer,
    pipelined_decode,
    pipelined_map,
)


class TestPipelinedMap:
    def test_preserves_order_and_results(self):
        f = jax.jit(lambda x: x * 2 + 1)
        items = [jnp.full((4,), i, jnp.float32) for i in range(7)]
        out = list(pipelined_map(f, items, depth=3))
        assert [int(i[0]) for i, _ in out] == list(range(7))
        for i, (item, res) in enumerate(out):
            np.testing.assert_allclose(np.asarray(res), 2.0 * i + 1)

    def test_depth_window(self):
        """At most `depth` dispatches happen before the first yield."""
        calls = []

        def f(x):
            calls.append(x)
            return x

        gen = pipelined_map(f, range(10), depth=2)
        first = next(gen)
        assert first == (0, 0)
        assert calls == [0, 1, 2]  # window filled to depth+1 then yields

    def test_depth_validation(self):
        with pytest.raises(ValueError):
            list(pipelined_map(lambda x: x, [1], depth=0))

    def test_decode_stream_matches_sequential(self):
        """pipelined_decode over real model batches == the sequential loop."""
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.api import model_sample
        from recurrent_fusion_network_tpu.models import setup
        from recurrent_fusion_network_tpu.training.eval_split import (
            batch_feats,
            dedupe_feats,
        )

        opt, loader = synthetic_setup(caption_model="show_tell", batch_size=4)
        opt.vocab_size, opt.seq_length = loader.vocab_size, loader.seq_length
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        decode = jax.jit(
            lambda f, a: model_sample(model, params, f, a, beam_size=2)
        )

        batches = []
        for _ in range(4):
            d = loader.get_batch("val")
            fc, att = batch_feats(d)
            batches.append(dedupe_feats(fc, att, loader.batch_size,
                                        loader.seq_per_img))

        want = [np.asarray(decode(*b).seq) for b in batches]
        got = [np.asarray(out.seq)
               for _, out in pipelined_decode(decode, batches, depth=2)]
        for w, g in zip(want, got):
            np.testing.assert_array_equal(w, g)


def _fake_decode(fcs, atts):
    """Deterministic stand-in decode: tokens derived from each row's fc."""
    f = jnp.asarray(fcs[0])
    a = jnp.asarray(atts[0])
    seq = (f[:, :1] + jnp.arange(3)[None, :]).astype(jnp.int32)
    return {"seq": seq, "score": f.sum(1) + a.sum((1, 2))}


def _request(i):
    fcs = [np.full((4,), float(i), np.float32)]
    atts = [np.full((2, 3), 0.5 * i, np.float32)]
    return fcs, atts


class TestCaptionServer:
    def test_rows_routed_back_to_requests(self):
        """Requests spanning full + padded tail batches each get THEIR row."""
        with CaptionServer(jax.jit(_fake_decode), batch_size=4, depth=2,
                           flush_interval=0.01) as srv:
            futs = [srv.submit(*_request(i)) for i in range(10)]
            for i, f in enumerate(futs):
                out = f.result(timeout=60)
                np.testing.assert_array_equal(out["seq"], [i, i + 1, i + 2])
                np.testing.assert_allclose(
                    out["score"], 4.0 * i + 0.5 * i * 6, rtol=1e-6
                )
        assert srv.stats["requests"] == 10
        # 10 requests -> at least one padded tail batch
        assert srv.stats["batches"] >= 3
        assert srv.stats["padded_rows"] == srv.stats["batches"] * 4 - 10

    def test_cancelled_future_does_not_kill_worker(self):
        """A client cancelling its Future (the asyncio front end does this
        when a handler task is cancelled) must not crash the worker with
        InvalidStateError — futures are never marked running, so cancel()
        always succeeds; an unguarded set_result on it would kill the
        worker thread and hang every later request."""
        with CaptionServer(jax.jit(_fake_decode), batch_size=2, depth=2,
                           flush_interval=0.005) as srv:
            srv.submit(*_request(0)).cancel()
            futs = [srv.submit(*_request(i)) for i in range(1, 5)]
            for i, f in zip(range(1, 5), futs):
                np.testing.assert_array_equal(
                    f.result(timeout=60)["seq"], [i, i + 1, i + 2]
                )
        assert not srv._worker.is_alive()

    def test_mixed_spec_batch_fails_strays_alone(self):
        """One batch = one shape: after a failed unconfirmed first batch
        resets the contract, a queued old-spec request must fail ALONE
        instead of poisoning the batch it would be stacked into."""
        from concurrent.futures import Future

        srv = CaptionServer(_fake_decode, batch_size=2, flush_interval=0.005)
        srv.close()  # worker gone: drive _dispatch/_resolve directly

        def entry(i, att_shape=(2, 3)):
            return ([np.full((4,), float(i), np.float32)],
                    [np.full(att_shape, 0.5 * i, np.float32)], Future())

        good0, stray, good1 = entry(0), entry(1, att_shape=(3, 3)), entry(2)
        futures, out = srv._dispatch([good0, stray, good1])
        srv._resolve(futures, out)
        with pytest.raises(ValueError, match="differ from this batch"):
            stray[2].result(timeout=5)
        np.testing.assert_array_equal(
            good0[2].result(timeout=5)["seq"], [0, 1, 2])
        np.testing.assert_array_equal(
            good1[2].result(timeout=5)["seq"], [2, 3, 4])

    def test_results_flow_without_close(self):
        """Futures resolve while the server stays open (window drains when
        the queue goes quiet — no deadlock waiting for more requests)."""
        srv = CaptionServer(jax.jit(_fake_decode), batch_size=2, depth=3,
                            flush_interval=0.005)
        try:
            futs = [srv.submit(*_request(i)) for i in range(6)]
            for i, f in enumerate(futs):  # .result() before close()
                np.testing.assert_array_equal(
                    f.result(timeout=60)["seq"], [i, i + 1, i + 2]
                )
        finally:
            srv.close()

    def test_matches_direct_batched_decode_real_model(self):
        """Server output rows == a direct jitted model_sample on the same
        batch composition (full batches, identical row order)."""
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.api import model_sample
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="show_tell", batch_size=4)
        opt.vocab_size, opt.seq_length = loader.vocab_size, loader.seq_length
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        decode = jax.jit(  # server hands lists; show_tell takes bare arrays
            lambda f, a: model_sample(model, params, f[0], a[0],
                                      beam_size=2)._asdict()
        )

        rng = np.random.default_rng(0)
        B = 8  # 2 full server batches of 4
        f0 = opt.feat_array_info[0]
        fc = rng.standard_normal((B, f0["fc_feat_size"])).astype(np.float32)
        att = rng.standard_normal(
            (B, f0["att_num"], f0["att_feat_size"])
        ).astype(np.float32)
        want = np.asarray(decode([fc], [att])["seq"])

        with CaptionServer(decode, batch_size=4, depth=2) as srv:
            futs = [srv.submit([fc[i]], [att[i]]) for i in range(B)]
            got = np.stack([f.result(timeout=120)["seq"] for f in futs])
        np.testing.assert_array_equal(got, want)

    def test_dp_mesh_sharded_batches(self):
        """With a mesh, dispatched batches arrive dp-sharded and results are
        still routed correctly."""
        from recurrent_fusion_network_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        seen = []

        def decode(fcs, atts):
            seen.append(fcs[0].sharding)
            return _fake_decode(fcs, atts)

        with CaptionServer(decode, batch_size=8, depth=1, mesh=mesh,
                           flush_interval=0.01) as srv:
            futs = [srv.submit(*_request(i)) for i in range(11)]
            for i, f in enumerate(futs):
                np.testing.assert_array_equal(
                    f.result(timeout=60)["seq"], [i, i + 1, i + 2]
                )
        from jax.sharding import NamedSharding, PartitionSpec

        assert all(isinstance(s, NamedSharding) for s in seen)
        assert all(s.spec == PartitionSpec("dp") for s in seen)

    def test_batch_size_must_divide_mesh(self):
        from recurrent_fusion_network_tpu.parallel.mesh import make_mesh

        with pytest.raises(ValueError, match="divide"):
            CaptionServer(_fake_decode, batch_size=6, mesh=make_mesh(8))

    def test_decode_error_fails_that_batch_only(self):
        calls = {"n": 0}

        def flaky(fcs, atts):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("boom")
            return _fake_decode(fcs, atts)

        with CaptionServer(flaky, batch_size=2, depth=1,
                           flush_interval=0.01) as srv:
            bad = [srv.submit(*_request(i)) for i in range(2)]
            # ensure the first batch dispatches (and fails) before the rest
            with pytest.raises(RuntimeError, match="boom"):
                bad[0].result(timeout=60)
            good = [srv.submit(*_request(i)) for i in range(2, 4)]
            for i, f in enumerate(good, start=2):
                np.testing.assert_array_equal(
                    f.result(timeout=60)["seq"], [i, i + 1, i + 2]
                )
        with pytest.raises(RuntimeError):
            bad[1].result(timeout=1)

    def test_http_service_batches_concurrent_requests(self):
        """The HTTP front end: concurrent clients coalesce into device
        batches and each gets ITS caption; /healthz reports stats."""
        import http.client
        import threading

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.http_serve import (
            CaptionService,
            run_server,
        )
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="show_tell", batch_size=4)
        opt.vocab_size, opt.seq_length = loader.vocab_size, loader.seq_length
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        service = CaptionService(model, params, loader.get_vocab(),
                                 batch_size=4, beam_size=2,
                                 flush_interval=0.01)
        httpd = run_server(service, "127.0.0.1", 0)
        port = httpd.server_address[1]
        try:
            # healthz
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            c.request("GET", "/healthz")
            h = json.loads(c.getresponse().read())
            assert h["ok"] and h["model"] == "ShowTellModel"

            f0 = opt.feat_array_info[0]
            g = np.random.default_rng(0)
            n_req = 9
            feats = [
                (g.standard_normal(f0["fc_feat_size"]).astype(np.float32),
                 g.standard_normal(
                     (f0["att_num"], f0["att_feat_size"])).astype(np.float32))
                for _ in range(n_req)
            ]
            results = [None] * n_req

            def client(i):
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
                body = json.dumps({"fc": [feats[i][0].tolist()],
                                   "att": [feats[i][1].tolist()]})
                conn.request("POST", "/caption", body)
                results[i] = json.loads(conn.getresponse().read())

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(n_req)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=180)
            assert all(r is not None and "caption" in r for r in results)

            # every client got ITS OWN row: compare to direct batched decode
            from recurrent_fusion_network_tpu.data.vocab import decode_sequence
            from recurrent_fusion_network_tpu.decoding.api import model_sample

            fc = jnp.asarray(np.stack([f for f, _ in feats]))
            att = jnp.asarray(np.stack([a for _, a in feats]))
            want = decode_sequence(
                loader.get_vocab(),
                np.asarray(model_sample(model, params, fc, att,
                                        beam_size=2).seq),
            )
            assert [r["caption"] for r in results] == want
            assert all(np.isfinite(r["logprob"]) for r in results)

            # malformed request fails alone with a 400
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            conn.request("POST", "/caption", json.dumps({"fc": [[1.0]],
                                                         "att": [[[1.0]]]}))
            resp = conn.getresponse()
            assert resp.status == 400 and "error" in json.loads(resp.read())
        finally:
            httpd.shutdown()
            service.close()

    def test_caption_service_multi_encoder_rfnet(self):
        """CaptionService serves the 5-encoder flagship family too: the
        feat_array path hands per-encoder lists through the batched queue."""
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.http_serve import CaptionService
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="recurrent_fusion_model",
                                      batch_size=4)
        opt.vocab_size, opt.seq_length = loader.vocab_size, loader.seq_length
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        svc = CaptionService(model, params, loader.get_vocab(),
                             batch_size=2, beam_size=2, flush_interval=0.01)
        try:
            g = np.random.default_rng(0)
            feats = opt.feat_array_info
            out = svc.caption_features(
                [g.standard_normal(f["fc_feat_size"]).astype(np.float32)
                 for f in feats],
                [g.standard_normal((f["att_num"], f["att_feat_size"]))
                 .astype(np.float32) for f in feats],
            )
            assert out["caption"] and np.isfinite(out["logprob"])
        finally:
            svc.close()

    def test_http_error_codes_distinguish_client_and_server(self):
        """400 for malformed requests; 500 when the decode itself fails."""
        import http.client
        import threading

        from recurrent_fusion_network_tpu.decoding.http_serve import (
            CaptionService,
            run_server,
        )

        class Boom:
            pass

        calls = {"n": 0}

        def flaky_decode(fcs, atts):
            calls["n"] += 1
            if calls["n"] >= 2:  # first (warm/contract) batch fine
                raise RuntimeError("device exploded")
            B = np.asarray(fcs[0]).shape[0]
            return {"seq": np.ones((B, 3), np.int32),
                    "seq_logprobs": np.zeros((B, 3), np.float32)}

        svc = CaptionService.__new__(CaptionService)
        svc.vocab = {"1": "w"}
        svc.model = Boom()
        svc.beam_size, svc.batch_size = 1, 2
        svc._backbone = None
        svc._decode = flaky_decode
        svc.server = CaptionServer(flaky_decode, 2, depth=1,
                                   flush_interval=0.01)
        httpd = run_server(svc, "127.0.0.1", 0)
        port = httpd.server_address[1]
        try:
            body = json.dumps({"fc": [[1.0, 2.0, 3.0, 4.0]],
                               "att": [[[0.5, 0.5, 0.5]] * 2]})
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            c.request("POST", "/caption", body)
            assert c.getresponse().status == 200  # first batch decodes
            c2 = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            c2.request("POST", "/caption", body)
            r2 = c2.getresponse()
            assert r2.status == 500  # device failure -> server error
            assert "RuntimeError" in json.loads(r2.read())["error"]
            c3 = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            c3.request("POST", "/caption", b"{not json")
            assert c3.getresponse().status == 400  # malformed -> client error
        finally:
            httpd.shutdown()
            svc.server.close()

    def test_submit_after_close_raises(self):
        srv = CaptionServer(_fake_decode, batch_size=2)
        srv.close()
        with pytest.raises(RuntimeError, match="closed"):
            srv.submit(*_request(0))

    def test_malformed_request_rejected_at_submit(self):
        """A shape-mismatched request fails ALONE at submit time — it never
        enters the queue, so co-batched requests and the worker are safe."""
        with CaptionServer(jax.jit(_fake_decode), batch_size=2, depth=1,
                           flush_interval=0.01) as srv:
            ok0 = srv.submit(*_request(0))
            with pytest.raises(ValueError, match="contract"):
                srv.submit([np.zeros((7,), np.float32)],  # wrong fc dim
                           [np.zeros((2, 3), np.float32)])
            ok = [ok0] + [srv.submit(*_request(i)) for i in range(1, 4)]
            for i, f in enumerate(ok):
                np.testing.assert_array_equal(
                    f.result(timeout=60)["seq"], [i, i + 1, i + 2]
                )

    def test_close_fails_requests_stranded_by_race(self):
        """A request that lands in the queue after the worker's final drain
        gets an exception, never a forever-pending Future."""
        srv = CaptionServer(_fake_decode, batch_size=2, flush_interval=0.01)
        srv._closing.set()
        srv._worker.join()
        fut = Future()
        srv._queue.put(([np.zeros(4, np.float32)],
                        [np.zeros((2, 3), np.float32)], fut))
        srv.close()
        with pytest.raises(RuntimeError, match="server closed"):
            fut.result(timeout=5)

    def test_feat_dims_rejects_malformed_first_request(self):
        """With feat_dims, a malformed FIRST request fails at submit and
        cannot establish a bogus shape contract (ADVICE r2: serve.py:141)."""
        with CaptionServer(jax.jit(_fake_decode), batch_size=2, depth=1,
                           flush_interval=0.01,
                           feat_dims=((4,), (3,))) as srv:
            with pytest.raises(ValueError, match="per-encoder dims"):
                srv.submit([np.zeros((7,), np.float32)],  # wrong fc dim
                           [np.zeros((2, 3), np.float32)])
            with pytest.raises(ValueError, match="per-encoder dims"):
                srv.submit([np.zeros((4, 1), np.float32)],  # wrong fc rank
                           [np.zeros((2, 3), np.float32)])
            futs = [srv.submit(*_request(i)) for i in range(2)]
            for i, f in enumerate(futs):
                np.testing.assert_array_equal(
                    f.result(timeout=60)["seq"], [i, i + 1, i + 2]
                )

    def test_feat_dims_none_entry_unconstrained(self):
        """A None expected dim (show_tell's unused att slot) skips the dim
        check but still enforces rank."""
        with CaptionServer(jax.jit(_fake_decode), batch_size=2, depth=1,
                           flush_interval=0.01,
                           feat_dims=((4,), (None,))) as srv:
            futs = [srv.submit(*_request(i)) for i in range(2)]
            for i, f in enumerate(futs):
                np.testing.assert_array_equal(
                    f.result(timeout=60)["seq"], [i, i + 1, i + 2]
                )

    def test_contract_resets_if_establishing_batch_fails(self):
        """Without feat_dims, a first request whose batch fails dispatch
        must not pin the contract forever: once the failing batch resolves,
        well-formed requests re-establish the contract and succeed."""
        def strict(fcs, atts):  # a real jitted model rejects wrong dims
            if fcs[0].shape[-1] != 4:
                raise ValueError("wrong fc dim")
            return _fake_decode(fcs, atts)

        with CaptionServer(strict, batch_size=1, depth=1,
                           flush_interval=0.01) as srv:
            bad = srv.submit([np.zeros((7,), np.float32)],  # wrong fc dim:
                             [np.zeros((2, 3), np.float32)])  # decode breaks
            with pytest.raises(ValueError, match="wrong fc dim"):
                bad.result(timeout=60)
            # the malformed request's (7,) contract must now be gone
            deadline = time.time() + 10
            while srv._spec is not None and time.time() < deadline:
                time.sleep(0.01)
            assert srv._spec is None
            good = srv.submit(*_request(1))
            np.testing.assert_array_equal(
                good.result(timeout=60)["seq"], [1, 2, 3]
            )


class TestAsyncFrontend:
    def test_asyncio_server_serves_captions(self):
        """The asyncio front end returns the same captions as the threading
        path and survives malformed requests + keep-alive reuse."""
        import http.client

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.aio_serve import (
            run_server_async,
        )
        from recurrent_fusion_network_tpu.decoding.http_serve import (
            CaptionService,
        )
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(seed=0)
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        svc = CaptionService(model, params, loader.get_vocab(),
                             batch_size=4, beam_size=2, depth=2)
        fe = run_server_async(svc, "127.0.0.1", 0)
        try:
            b = loader.get_batch("val")
            fcs = [np.asarray(f[0]).tolist() for f in b["fc_feats_array"]]
            atts = [np.asarray(a[0]).tolist() for a in b["att_feats_array"]]
            want = svc.caption_features(
                [np.asarray(f) for f in fcs], [np.asarray(a) for a in atts]
            )

            conn = http.client.HTTPConnection("127.0.0.1", fe.port, timeout=60)
            # healthz
            conn.request("GET", "/healthz")
            r = conn.getresponse()
            health = json.loads(r.read())
            assert r.status == 200 and health["frontend"] == "asyncio"
            # two captions on the SAME keep-alive connection
            for _ in range(2):
                conn.request("POST", "/caption",
                             body=json.dumps({"fc": fcs, "att": atts}))
                r = conn.getresponse()
                out = json.loads(r.read())
                assert r.status == 200, out
                assert out["caption"] == want["caption"]
            # malformed JSON -> 400, connection stays usable
            conn.request("POST", "/caption", body=b"{nope")
            r = conn.getresponse()
            assert r.status == 400
            json.loads(r.read())
            # wrong dims -> 400 (submit-time validation)
            conn.request("POST", "/caption", body=json.dumps(
                {"fc": [[0.0] * 3] * len(fcs), "att": [[[0.0] * 2]] * len(atts)}
            ))
            r = conn.getresponse()
            assert r.status == 400
            json.loads(r.read())
            # unknown path -> 404
            conn.request("GET", "/nothing")
            r = conn.getresponse()
            assert r.status == 404
            json.loads(r.read())
            conn.close()
        finally:
            fe.stop()
            svc.close()

    def test_asyncio_malformed_content_length(self):
        """Non-numeric/negative Content-Length gets a 400 response, not a
        dead handler task (review r3)."""
        import socket

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.aio_serve import (
            run_server_async,
        )
        from recurrent_fusion_network_tpu.decoding.http_serve import (
            CaptionService,
        )
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="show_tell", seed=1)
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        svc = CaptionService(model, params, loader.get_vocab(),
                             batch_size=2, beam_size=2)
        fe = run_server_async(svc, "127.0.0.1", 0)
        try:
            for bad in ("abc", "-5"):
                s = socket.create_connection(("127.0.0.1", fe.port),
                                             timeout=30)
                s.sendall(
                    f"POST /caption HTTP/1.1\r\nHost: x\r\n"
                    f"Content-Length: {bad}\r\n\r\n".encode()
                )
                resp = s.recv(4096).decode()
                assert resp.startswith("HTTP/1.1 400"), resp
                s.close()
        finally:
            fe.stop()
            svc.close()

    def test_binary_npz_payload_both_frontends(self):
        """POST /caption accepts binary npz bodies (fc_i/att_i arrays) on
        BOTH front ends and returns the same caption as the JSON body; a
        corrupt zip is a 400 (client error), not a 500. At flagship feature
        dims npz parses ~80x faster than JSON text and is ~5x smaller on
        the wire (PERF_NOTES 4f)."""
        import http.client
        import io

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.aio_serve import (
            run_server_async,
        )
        from recurrent_fusion_network_tpu.decoding.http_serve import (
            CaptionService,
            run_server,
        )
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="show_tell", seed=3)
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        svc = CaptionService(model, params, loader.get_vocab(),
                             batch_size=4, beam_size=2)
        b = loader.get_batch("val")
        fc = np.asarray(b["fc_feats"][0], np.float32)
        att = np.asarray(b["att_feats"][0], np.float32)
        body_json = json.dumps({"fc": [fc.tolist()], "att": [att.tolist()]})
        buf = io.BytesIO()
        np.savez(buf, fc_0=fc, att_0=att)
        body_npz = buf.getvalue()

        fe = run_server_async(svc, "127.0.0.1", 0)
        httpd = run_server(svc, "127.0.0.1", 0)
        try:
            for port in (fe.port, httpd.server_address[1]):
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=60)
                conn.request("POST", "/caption", body=body_json)
                want = json.loads(conn.getresponse().read())
                # content-type route and zip-magic sniffing route
                for hdrs in ({"Content-Type": "application/x-npz"}, {}):
                    conn.request("POST", "/caption", body=body_npz,
                                 headers=hdrs)
                    r = conn.getresponse()
                    got = json.loads(r.read())
                    assert r.status == 200, got
                    assert got["caption"] == want["caption"]
                # corrupt zip -> 400
                conn.request("POST", "/caption",
                             body=b"PK\x03\x04garbage",
                             headers={"Content-Type": "application/x-npz"})
                r = conn.getresponse()
                assert r.status == 400, r.read()
                json.loads(r.read())
                # npz without fc_i arrays -> 400
                buf2 = io.BytesIO()
                np.savez(buf2, other=fc)
                conn.request("POST", "/caption", body=buf2.getvalue())
                r = conn.getresponse()
                assert r.status == 400, r.read()
                r.read()
                conn.close()
        finally:
            fe.stop()
            httpd.shutdown()
            svc.close()

    def test_npz_payload_hardening(self):
        """Zip-layer abuse is a client error, never a crash: a bare .npy
        body (np.save, not np.savez), and a tiny compressed body that
        decompresses past the size cap (zip-bomb guard) are rejected
        BEFORE any array is materialized."""
        import io
        import zipfile

        import pytest as _pytest

        from recurrent_fusion_network_tpu.decoding.http_serve import (
            parse_features_payload,
        )

        # bare .npy (np.load returns an ndarray, not an NpzFile)
        buf = io.BytesIO()
        np.save(buf, np.zeros(4, np.float32))
        with _pytest.raises(ValueError, match="bare array"):
            parse_features_payload(buf.getvalue(), "application/x-npz")

        # zip bomb: ~40 MB of zeros deflates to ~40 KB; cap at 1 MB
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            inner = io.BytesIO()
            np.save(inner, np.zeros(10_000_000, np.float32))
            z.writestr("fc_0.npy", inner.getvalue())
        with _pytest.raises(ValueError, match="decompresses"):
            parse_features_payload(buf.getvalue(), "application/x-npz",
                                   max_bytes=1 << 20)

        # corrupt deflate stream inside a structurally-valid zip: member
        # access raises zlib.error (or a CRC BadZipFile) lazily — both must
        # normalize to ValueError, not escape as a 500/connection drop
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            inner = io.BytesIO()
            np.save(inner, np.random.RandomState(0)
                    .randn(4096).astype(np.float32))
            z.writestr("fc_0.npy", inner.getvalue())
            inner2 = io.BytesIO()
            np.save(inner2, np.zeros(4, np.float32))
            z.writestr("att_0.npy", inner2.getvalue())
        blob = bytearray(buf.getvalue())
        for off in range(200, 1000):  # scribble over member data only
            blob[off] ^= 0xFF
        with _pytest.raises(ValueError):
            parse_features_payload(bytes(blob), "application/x-npz")

    def test_npz_bad_body_is_400_not_connection_drop(self):
        """A bare-.npy body over HTTP must produce a 400 response on the
        asyncio front end (an uncaught exception would drop the
        connection with no response at all)."""
        import http.client
        import io

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.aio_serve import (
            run_server_async,
        )
        from recurrent_fusion_network_tpu.decoding.http_serve import (
            CaptionService,
        )
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="show_tell", seed=3)
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        svc = CaptionService(model, params, loader.get_vocab(),
                             batch_size=4, beam_size=2)
        fe = run_server_async(svc, "127.0.0.1", 0)
        try:
            buf = io.BytesIO()
            np.save(buf, np.zeros(4, np.float32))
            conn = http.client.HTTPConnection("127.0.0.1", fe.port, timeout=30)
            conn.request("POST", "/caption", body=buf.getvalue(),
                         headers={"Content-Type": "application/x-npz"})
            r = conn.getresponse()
            body = r.read()
            assert r.status == 400, body
            assert "error" in json.loads(body)
            conn.close()
        finally:
            fe.stop()
            svc.close()

    def test_serve_py_sigterm_drains_and_exits_zero(self, tmp_path):
        """Real-surface drill: serve.py under SIGTERM stops the listener,
        drains, prints 'shutdown complete', and exits 0 — the serving
        analogue of the training preemption drill."""
        import http.client
        import os
        import re
        import signal
        import subprocess
        import sys
        import time

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.models import setup
        from recurrent_fusion_network_tpu.training.checkpoint import (
            save_checkpoint,
        )

        opt, loader = synthetic_setup(caption_model="show_tell", seed=3)
        opt.vocab_size, opt.seq_length = loader.vocab_size, loader.seq_length
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        infos = {"opt": dict(vars(opt)), "vocab": loader.get_vocab()}
        save_checkpoint(str(tmp_path), "sv", 0, params=params,
                        opt_state=None, infos=infos, best=True)

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS")}
        env["JAX_PLATFORMS"] = "cpu"
        # 8 virtual devices: the drill also covers --serve_dp_devices
        # (dp-sharded decode batches + mesh-matched warmup)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        env["PYTHONUNBUFFERED"] = "1"
        p = subprocess.Popen(
            [sys.executable, os.path.join(repo, "serve.py"),
             "--model_path", str(tmp_path), "--load_model_id", "sv",
             "--id", "sv", "--checkpoint_path", str(tmp_path),
             "--host", "127.0.0.1", "--port", "0", "--beam_size", "2",
             "--serve_batch_size", "8", "--serve_dp_devices", "8"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        try:
            port = None
            deadline = time.time() + 120
            for line in p.stdout:
                m = re.search(r"caption service \(asyncio\) on [\d.]+:(\d+)",
                              line)
                if m:
                    port = int(m.group(1))
                    break
                assert time.time() < deadline, "server never came up"
            assert port
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("GET", "/healthz")
            r = conn.getresponse()
            assert r.status == 200
            r.read()  # drain the body so the keep-alive conn can be reused
            b = loader.get_batch("val")
            body = json.dumps({
                "fc": [np.asarray(b["fc_feats"][0], np.float32).tolist()],
                "att": [np.asarray(b["att_feats"][0], np.float32).tolist()],
            })
            conn.request("POST", "/caption", body=body)
            r = conn.getresponse()
            got = json.loads(r.read())
            assert r.status == 200 and "caption" in got, got
            conn.close()
            p.send_signal(signal.SIGTERM)
            out = p.stdout.read()
            assert p.wait(timeout=60) == 0, out[-3000:]
            assert "shutdown complete" in out, out[-3000:]
        finally:
            if p.poll() is None:
                p.kill()

    def test_asyncio_graceful_drain_answers_inflight_request(self):
        """stop(drain=True) must close the listener (new connections
        refused) yet still deliver the response for a request already being
        processed — the serving analogue of the training loops' graceful
        preemption."""
        import http.client
        import socket
        import threading
        import time

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.aio_serve import (
            run_server_async,
        )
        from recurrent_fusion_network_tpu.decoding.http_serve import (
            CaptionService,
        )
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="show_tell", seed=3)
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        svc = CaptionService(model, params, loader.get_vocab(),
                             batch_size=4, beam_size=2)
        # slow the device path down so the request is reliably in flight
        # when the drain starts
        orig = svc.server.decode_fn
        svc.server.decode_fn = (
            lambda f, a: (time.sleep(0.6), orig(f, a))[1]
        )
        b = loader.get_batch("val")
        body = json.dumps({
            "fc": [np.asarray(b["fc_feats"][0], np.float32).tolist()],
            "att": [np.asarray(b["att_feats"][0], np.float32).tolist()],
        })
        fe = run_server_async(svc, "127.0.0.1", 0)
        result = {}

        def client():
            conn = http.client.HTTPConnection("127.0.0.1", fe.port,
                                              timeout=60)
            conn.request("POST", "/caption", body=body)
            r = conn.getresponse()
            result["status"], result["body"] = r.status, r.read()
            conn.close()

        t = threading.Thread(target=client)
        t.start()
        time.sleep(0.2)  # request submitted, decode sleeping
        try:
            fe.stop(drain=True, timeout=30)
            t.join(timeout=60)
            assert result.get("status") == 200, result
            assert "caption" in json.loads(result["body"])
            # listener is gone: a new connection is refused
            with pytest.raises(OSError):
                s = socket.create_connection(("127.0.0.1", fe.port),
                                             timeout=2)
                # some platforms accept then reset; force the failure
                s.sendall(b"GET /healthz HTTP/1.1\r\n\r\n")
                assert s.recv(1) == b""
                raise ConnectionRefusedError
        finally:
            svc.close()

    def test_graceful_drain_not_stalled_by_idle_keepalive(self):
        """An IDLE keep-alive connection must not stall the graceful drain:
        on Python >= 3.12.1 Server.wait_closed() waits for every CONNECTION
        to drop, so awaiting it (old code) turned a sub-second shutdown into
        the full timeout. The drain now closes only the listener, the
        draining flag cuts idle keep-alive loops, and stop() returns as
        soon as in-flight hits zero."""
        import http.client
        import time

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.aio_serve import (
            run_server_async,
        )
        from recurrent_fusion_network_tpu.decoding.http_serve import (
            CaptionService,
        )
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="show_tell", seed=4)
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        svc = CaptionService(model, params, loader.get_vocab(),
                             batch_size=2, beam_size=2)
        fe = run_server_async(svc, "127.0.0.1", 0)
        try:
            b = loader.get_batch("val")
            body = json.dumps({
                "fc": [np.asarray(b["fc_feats"][0], np.float32).tolist()],
                "att": [np.asarray(b["att_feats"][0], np.float32).tolist()],
            })
            conn = http.client.HTTPConnection("127.0.0.1", fe.port,
                                              timeout=60)
            conn.request("POST", "/caption", body=body)
            r = conn.getresponse()
            r.read()
            assert r.status == 200
            # connection now idles on keep-alive (parked in readuntil)
            t0 = time.monotonic()
            fe.stop(drain=True, timeout=25)
            elapsed = time.monotonic() - t0
            assert elapsed < 10, (
                f"drain stalled {elapsed:.1f}s on an idle keep-alive "
                f"connection"
            )
            conn.close()
        finally:
            svc.close()

    def test_closed_service_returns_503_on_both_frontends(self):
        """POSTs landing during/after shutdown get 503 (retryable — a
        rolling restart wants load balancers to retry elsewhere), not 400
        ('your request is malformed') or a generic 500."""
        import http.client

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.aio_serve import (
            run_server_async,
        )
        from recurrent_fusion_network_tpu.decoding.http_serve import (
            CaptionService,
            run_server,
        )
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="show_tell", seed=5)
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        b = loader.get_batch("val")
        body = json.dumps({
            "fc": [np.asarray(b["fc_feats"][0], np.float32).tolist()],
            "att": [np.asarray(b["att_feats"][0], np.float32).tolist()],
        })

        for frontend in ("asyncio", "threads"):
            svc = CaptionService(model, params, loader.get_vocab(),
                                 batch_size=2, beam_size=2)
            if frontend == "asyncio":
                fe = run_server_async(svc, "127.0.0.1", 0)
                port = fe.port
            else:
                httpd = run_server(svc, "127.0.0.1", 0)
                port = httpd.server_address[1]
            try:
                svc.server.close()  # the shutdown path closes the server
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=60)
                conn.request("POST", "/caption", body=body)
                r = conn.getresponse()
                assert r.status == 503, (frontend, r.status, r.read())
                json.loads(r.read())
                conn.close()
            finally:
                if frontend == "asyncio":
                    fe.stop()
                else:
                    httpd.shutdown()
                svc.close()

    def test_threads_frontend_validates_content_length(self):
        """Negative / non-numeric Content-Length on the THREADING front end
        gets a 400 response instead of a blocking rfile.read(-1) (thread
        pinned for the client's timeout) or an uncaught ValueError."""
        import socket

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.http_serve import (
            CaptionService,
            run_server,
        )
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="show_tell", seed=6)
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        svc = CaptionService(model, params, loader.get_vocab(),
                             batch_size=2, beam_size=2)
        httpd = run_server(svc, "127.0.0.1", 0)
        port = httpd.server_address[1]
        try:
            for bad in (b"-7", b"abc"):
                with socket.create_connection(("127.0.0.1", port),
                                              timeout=30) as s:
                    s.sendall(b"POST /caption HTTP/1.1\r\n"
                              b"Host: x\r\nContent-Length: " + bad +
                              b"\r\n\r\n")
                    resp = s.recv(4096)
                    assert b"400" in resp.split(b"\r\n", 1)[0], (bad, resp)
        finally:
            httpd.shutdown()
            svc.close()

    def test_asyncio_mid_body_disconnect_and_bind_error(self):
        """A client that dies mid-body must not leave an unhandled
        IncompleteReadError task, and a bind failure must surface the real
        OSError immediately instead of a 30 s generic timeout (review r3)."""
        import socket

        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.aio_serve import (
            AsyncCaptionFrontend,
            run_server_async,
        )
        from recurrent_fusion_network_tpu.decoding.http_serve import (
            CaptionService,
        )
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="show_tell", seed=2)
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        svc = CaptionService(model, params, loader.get_vocab(),
                             batch_size=2, beam_size=2)
        fe = run_server_async(svc, "127.0.0.1", 0)
        try:
            # disconnect mid-body: Content-Length promises more than sent
            s = socket.create_connection(("127.0.0.1", fe.port), timeout=30)
            s.sendall(b"POST /caption HTTP/1.1\r\nHost: x\r\n"
                      b"Content-Length: 100000\r\n\r\npartial")
            s.close()
            # the server must still answer new requests afterwards
            import http.client

            conn = http.client.HTTPConnection("127.0.0.1", fe.port,
                                              timeout=30)
            conn.request("GET", "/healthz")
            assert conn.getresponse().status == 200
            conn.close()

            # second bind on the same port -> immediate OSError-carrying error
            fe2 = AsyncCaptionFrontend(svc)
            t0 = time.monotonic()
            with pytest.raises(RuntimeError, match="failed to start"):
                fe2.start("127.0.0.1", fe.port)
            assert time.monotonic() - t0 < 10, "bind error took the slow path"
        finally:
            fe.stop()
            svc.close()


class TestDevicePadAndCast:
    """Partial-batch device padding + submit-time dtype casting: the H2D
    payload of a dispatch must scale with REAL rows (a nearly-empty
    batch-64 flagship batch is ~0.5 GB of host-padded upload otherwise —
    measured seconds per dispatch on the tunneled bench host) and requests
    must reach the decode graph in the params' compute dtype."""

    def test_partial_batch_rows_match_direct_decode(self):
        """3 requests into a batch-8 server (pow2 bucket 4: host pads one
        replica row, device zero-fills 4 more) must produce exactly the
        rows a direct decode of that assembled batch produces."""
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.api import model_sample
        from recurrent_fusion_network_tpu.models import setup

        opt, loader = synthetic_setup(caption_model="show_tell", batch_size=4)
        opt.vocab_size, opt.seq_length = loader.vocab_size, loader.seq_length
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        decode = jax.jit(
            lambda f, a: model_sample(model, params, f[0], a[0],
                                      beam_size=2)._asdict()
        )

        rng = np.random.default_rng(1)
        f0 = opt.feat_array_info[0]
        fc = rng.standard_normal((3, f0["fc_feat_size"])).astype(np.float32)
        att = rng.standard_normal(
            (3, f0["att_num"], f0["att_feat_size"])
        ).astype(np.float32)

        # the exact batch _dispatch assembles: bucket=4 (last row
        # replicated), device zero-fill to 8
        fc_full = np.concatenate(
            [fc, fc[2:3], np.zeros((4, fc.shape[1]), np.float32)])
        att_full = np.concatenate(
            [att, att[2:3], np.zeros((4,) + att.shape[1:], np.float32)])
        want = np.asarray(decode([fc_full], [att_full])["seq"])

        with CaptionServer(decode, batch_size=8, depth=1,
                           flush_interval=0.2) as srv:
            futs = [srv.submit([fc[i]], [att[i]]) for i in range(3)]
            got = np.stack([f.result(timeout=120)["seq"] for f in futs])
        assert srv.stats["batches"] == 1, "requests split across batches"
        assert srv.stats["h2d_rows"] == 4
        np.testing.assert_array_equal(got, want[:3])

    def test_single_request_uploads_one_row(self):
        with CaptionServer(jax.jit(_fake_decode), batch_size=8, depth=1,
                           flush_interval=0.01) as srv:
            out = srv.submit(*_request(5)).result(timeout=60)
        np.testing.assert_array_equal(out["seq"], [5, 6, 7])
        assert srv.stats["h2d_rows"] == 1
        assert srv.stats["padded_rows"] == 7

    def test_device_pad_off_uploads_full_batch(self):
        with CaptionServer(jax.jit(_fake_decode), batch_size=8, depth=1,
                           flush_interval=0.01, device_pad=False) as srv:
            srv.submit(*_request(2)).result(timeout=60)
        assert srv.stats["h2d_rows"] == 8

    def test_cast_dtype_reaches_decode(self):
        seen = {}

        def decode(fcs, atts):
            seen["dt"] = (np.dtype(fcs[0].dtype), np.dtype(atts[0].dtype))
            return _fake_decode([jnp.asarray(fcs[0], jnp.float32)],
                                [jnp.asarray(atts[0], jnp.float32)])

        with CaptionServer(decode, batch_size=2, depth=1,
                           flush_interval=0.01,
                           cast_dtype=jnp.bfloat16) as srv:
            out = srv.submit(*_request(3)).result(timeout=60)
        bf16 = np.dtype(jnp.bfloat16)
        assert seen["dt"] == (bf16, bf16)
        np.testing.assert_array_equal(out["seq"], [3, 4, 5])

    def test_caption_service_bf16_params_sets_cast(self):
        """CaptionService derives the request cast dtype from the params'
        float leaves, and a bf16 service still answers correctly."""
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.http_serve import (
            CaptionService,
        )
        from recurrent_fusion_network_tpu.models import setup
        from recurrent_fusion_network_tpu.training.eval_split import cast_tree

        opt, loader = synthetic_setup(caption_model="show_tell", batch_size=4)
        opt.vocab_size, opt.seq_length = loader.vocab_size, loader.seq_length
        model = setup(opt)
        params = cast_tree(model.init_params(jax.random.PRNGKey(0)),
                           jnp.bfloat16)
        svc = CaptionService(model, params, loader.get_vocab(),
                             batch_size=2, beam_size=2, depth=1)
        try:
            assert svc.server.cast_dtype == np.dtype(jnp.bfloat16)
            f0 = opt.feat_array_info[0]
            rng = np.random.default_rng(2)
            out = svc.caption_features(
                [rng.standard_normal(f0["fc_feat_size"])],
                [rng.standard_normal((f0["att_num"],
                                      f0["att_feat_size"]))],
            )
            assert isinstance(out["caption"], str)
        finally:
            svc.close()
