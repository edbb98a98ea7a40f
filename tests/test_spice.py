"""SPICE adapter tests: the exact I/O contracts of the reference's
spice-1.0.jar CLI (coco-caption/pycocoevalcap/spice/spice.py:27-97) and the
persistent HTTP service (cider/pyciderevalcap/spiceD/spiceD.py:30-114),
exercised against protocol doubles (a fake scorer honoring the same file
formats)."""

import json
import threading

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from recurrent_fusion_network_tpu.metrics.spice import (
    SpiceHTTPScorer,
    SpiceJavaScorer,
    spice_fn_from_scorer,
)


def fake_spice_score(test: str, refs) -> float:
    """Deterministic stand-in for SPICE: token-overlap F1 with the best ref."""
    best = 0.0
    t = set(test.split())
    for r in refs:
        rs = set(r.split())
        if not t or not rs:
            continue
        inter = len(t & rs)
        p, rr = inter / len(t), inter / len(rs)
        if p + rr:
            best = max(best, 2 * p * rr / (p + rr))
    return best


def fake_jar(in_path, out_path, cache_dir):
    """Runner double: consumes the jar's input JSON, emits its output JSON."""
    with open(in_path) as f:
        data = json.load(f)
    out = []
    for item in data:
        f1 = fake_spice_score(item["test"], item["refs"])
        out.append(
            {
                "image_id": item["image_id"],
                "scores": {
                    "All": {"f": f1, "pr": f1, "re": f1},
                    "Object": {"f": f1, "pr": f1, "re": f1},
                },
            }
        )
    with open(out_path, "w") as f:
        json.dump(out, f)


GTS = {
    7: ["a dog runs in the park", "the dog is running"],
    3: ["a man rides a bike"],
}
RES = {7: ["a dog runs"], 3: ["a man walks home"]}


class TestJavaAdapter:
    def test_contract_and_scores(self, tmp_path):
        scorer = SpiceJavaScorer(work_dir=str(tmp_path), runner=fake_jar)
        mean, sent = scorer.compute_score(GTS, RES)
        # sorted image-id order: 3 then 7
        want3 = fake_spice_score(RES[3][0], GTS[3])
        want7 = fake_spice_score(RES[7][0], GTS[7])
        np.testing.assert_allclose(sent, [want3, want7])
        np.testing.assert_allclose(mean, np.mean([want3, want7]))
        assert scorer.last_details[7]["All"]["f"] == want7
        # temp files cleaned up; cache dir remains
        left = [p.name for p in tmp_path.iterdir()]
        assert left == ["spice_cache"]

    def test_plugs_into_harness(self, tmp_path):
        from recurrent_fusion_network_tpu.metrics import evaluate_captions

        scorer = SpiceJavaScorer(work_dir=str(tmp_path), runner=fake_jar)
        out = evaluate_captions(GTS, RES, extra_scorers={"SPICE": scorer.compute_score})
        assert "SPICE" in out["overall"]
        assert all("SPICE" in v for v in out["img_scores"].values())

    def test_default_runner_builds_reference_cmd(self, tmp_path, monkeypatch):
        calls = {}

        def fake_check_call(cmd):
            calls["cmd"] = cmd
            # honor the contract so parsing succeeds
            in_path = cmd[4]
            out_path = cmd[cmd.index("-out") + 1]
            cache = cmd[cmd.index("-cache") + 1]
            fake_jar(in_path, out_path, cache)

        import recurrent_fusion_network_tpu.metrics.spice as spice_mod

        monkeypatch.setattr(spice_mod.subprocess, "check_call", fake_check_call)
        scorer = SpiceJavaScorer("my/spice-1.0.jar", xmx="2G",
                                 work_dir=str(tmp_path))
        mean, sent = scorer.compute_score(GTS, RES)
        cmd = calls["cmd"]
        # java -jar -Xmx2G my/spice-1.0.jar <in> -cache <dir> -out <out>
        # -subset -silent  (spice.py:64-71)
        assert cmd[0] == "java" and cmd[1] == "-jar" and cmd[2] == "-Xmx2G"
        assert cmd[3] == "my/spice-1.0.jar"
        assert cmd[-2:] == ["-subset", "-silent"]
        assert len(sent) == 2


class TestHTTPAdapter:
    def test_service_protocol(self, tmp_path):
        from http.server import BaseHTTPRequestHandler, HTTPServer
        from urllib.parse import parse_qs, urlparse

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                q = parse_qs(urlparse(self.path).query)
                assert urlparse(self.path).path == "/test"
                assert q["subset"] == ["1"] and q["silent"] == ["1"]
                fake_jar(q["in"][0], q["out"][0], q["cache"][0])
                with open(q["out"][0], "rb") as f:
                    body = f.read()
                self.send_response(200)
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        srv = HTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            scorer = SpiceHTTPScorer("127.0.0.1", srv.server_port,
                                     work_dir=str(tmp_path))
            mean, sent = scorer.compute_score(GTS, RES)
            want3 = fake_spice_score(RES[3][0], GTS[3])
            want7 = fake_spice_score(RES[7][0], GTS[7])
            np.testing.assert_allclose(sent, [want3, want7])
        finally:
            srv.shutdown()


class TestRewardHook:
    def test_spice_fn_from_scorer_decodes_and_scores(self, tmp_path):
        ix_to_word = {"1": "dog", "2": "runs", "3": "cat"}
        scorer = SpiceJavaScorer(work_dir=str(tmp_path), runner=fake_jar)
        fn = spice_fn_from_scorer(scorer, ix_to_word)
        hyps = [np.array([1, 2, 0, 0]), np.array([3, 0, 0, 0])]
        refs = [[np.array([1, 2])], [np.array([1, 2])]]
        scores = fn(hyps, refs)
        assert scores[0] == 1.0  # "dog runs" vs "dog runs"
        assert scores[1] == 0.0  # "cat" vs "dog runs"

    def test_scores_align_with_hyp_order_beyond_ten(self, tmp_path):
        """Regression: scorers emit per-image scores in STRING-sorted id
        order (0,1,10,11,...,2,...); with 12 hyps the adapter must invert
        that permutation so hyp i gets ITS score."""
        ix_to_word = {"1": "dog", "2": "runs", "3": "cat"}
        scorer = SpiceJavaScorer(work_dir=str(tmp_path), runner=fake_jar)
        fn = spice_fn_from_scorer(scorer, ix_to_word)
        # hyp 2 and hyp 10 differ: 2 matches its refs exactly, 10 does not
        N = 12
        hyps, refs = [], []
        for i in range(N):
            if i == 2:
                hyps.append(np.array([1, 2, 0]))   # "dog runs"
            else:
                hyps.append(np.array([3, 0, 0]))   # "cat"
            refs.append([np.array([1, 2])])        # ref "dog runs"
        scores = fn(hyps, refs)
        assert scores[2] == 1.0, scores
        assert all(scores[i] == 0.0 for i in range(N) if i != 2), scores

    def test_rl_loop_wires_service_from_opt(self, tmp_path, monkeypatch):
        """train_rl with spice_weight>0 must target opt.ip/opt.port
        (reference get_rewards.py:75-94)."""
        from recurrent_fusion_network_tpu.data.prepro_ngrams import compute_doc_freq
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.rewards.cider_d import CiderD
        from recurrent_fusion_network_tpu.training.train_rl_loop import train_rl
        import recurrent_fusion_network_tpu.metrics.spice as spice_mod

        seen = {}

        class FakeHTTP:
            def __init__(self, ip, port):
                seen["addr"] = (ip, port)

            def compute_score(self, gts, res):
                sent = [0.5] * len(res)
                return 0.5, sent

        monkeypatch.setattr(spice_mod, "SpiceHTTPScorer", FakeHTTP)
        opt, loader = synthetic_setup(caption_model="show_tell", batch_size=3,
                                      seq_per_img=2)
        opt.checkpoint_path = str(tmp_path)
        opt.spice_weight = 0.5
        opt.spice_backend = "http"  # default is the in-repo approx scorer
        opt.ip, opt.port = "10.0.0.5", 1234
        ids = loader.split_image_id["train"]
        scorer = CiderD(compute_doc_freq(loader.dataset, ids),
                        float(np.log(len(ids))))
        train_rl(opt, loader, scorer, max_iterations=1, log_fn=lambda *a, **k: None)
        assert seen["addr"] == ("10.0.0.5", 1234)
