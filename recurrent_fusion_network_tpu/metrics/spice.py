"""SPICE scorer adapters (external-tool protocol, Java-free in-repo).

The reference ships two SPICE paths, both driving the official spice-1.0.jar:

  * batch eval: temp input JSON -> `java -jar -Xmx8G spice-1.0.jar in.json
    -cache C -out out.json -subset -silent` -> output JSON with per-image
    F-scores (coco-caption/pycocoevalcap/spice/spice.py:27-97);
  * RL reward service: the same file protocol via HTTP GET
    `http://ip:port/test?in=...&out=...&cache=...&subset=1&silent=1` against
    a persistent Java service (cider/pyciderevalcap/spiceD/spiceD.py:30-114).

The jar and its CoreNLP dependency tree cannot ship in this repo, so these
adapters implement the exact I/O contracts against a user-supplied tool:
point SpiceJavaScorer at a spice-1.0.jar (or any executable honoring the
same CLI) or SpiceHTTPScorer at a running service. Both plug into
`evaluate_captions(extra_scorers={"SPICE": scorer.compute_score})` and, via
`spice_fn_from_scorer`, into the RL reward combiner's `spice_fn` hook
(rewards/self_critical.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile
import urllib.parse
import urllib.request
from typing import Dict, List, Optional, Sequence

import numpy as np


def _assemble_input(gts: Dict, res: Dict) -> List[dict]:
    """The jar's input records (spice.py:32-47): one per image, sorted ids."""
    assert sorted(gts.keys(), key=str) == sorted(res.keys(), key=str)
    data = []
    for image_id in sorted(res.keys(), key=str):
        hypo, ref = res[image_id], gts[image_id]
        assert isinstance(hypo, list) and len(hypo) == 1
        assert isinstance(ref, list) and len(ref) >= 1
        data.append({"image_id": image_id, "test": hypo[0], "refs": list(ref)})
    return data


def _float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return float("nan")


def _parse_output(results: List[dict], image_ids: Sequence):
    """(mean, per-sentence All-F list, per-image category dict) from the
    jar's output records (spice.py:74-90)."""
    by_id = {item["image_id"]: item["scores"] for item in results}
    sent_scores, details = [], {}
    for image_id in image_ids:
        scores = by_id[image_id]
        sent_scores.append(_float(scores["All"]["f"]))
        details[image_id] = {
            cat: {k: _float(v) for k, v in tup.items()}
            for cat, tup in scores.items()
        }
    finite = [s for s in sent_scores if not np.isnan(s)]
    # all-NaN (every pair had empty scene graphs): keep the jar's NaN
    # convention without numpy's all-NaN-slice RuntimeWarning; the written
    # eval JSON serializes it as null (coco_eval._finite), and the RL hook
    # nan_to_nums it
    mean = float(np.mean(finite)) if finite else (
        float("nan") if sent_scores else 0.0
    )
    return mean, sent_scores, details


def _file_handoff(data, invoke, work_dir: str):
    """Shared jar/service lifecycle: write the input JSON to a temp file,
    let `invoke(in_path, out_path)` populate out_path, read it, clean up.
    Raw mkstemp descriptors are closed in ALL paths (a json.dump failure
    previously leaked fd_out until EMFILE under per-batch retry loops)."""
    fd_in, in_path = tempfile.mkstemp(suffix=".json", dir=work_dir)
    fd_out, out_path = tempfile.mkstemp(suffix=".json", dir=work_dir)
    os.close(fd_out)
    try:
        try:
            with os.fdopen(fd_in, "w") as f:
                json.dump(data, f, indent=2)
        except Exception:
            fd_in = None  # fdopen owns/closed it even on dump failure
            raise
        fd_in = None
        invoke(in_path, out_path)
        with open(out_path) as f:
            return json.load(f), out_path
    finally:
        if fd_in is not None:
            os.close(fd_in)
        for p_ in (in_path, out_path):
            if os.path.exists(p_):
                os.remove(p_)


class SpiceJavaScorer:
    """Batch SPICE via the official jar's CLI contract.

    runner: override for tests / non-Java implementations — a callable
    (in_path, out_path, cache_dir) that must populate out_path with the
    jar's output JSON. Default launches `java -jar -Xmx.. <jar> ...`
    exactly like the reference (spice.py:64-71).
    """

    def __init__(self, jar_path: str = "spice-1.0.jar", *, java_bin: str = "java",
                 xmx: str = "8G", work_dir: Optional[str] = None, runner=None):
        self.jar_path = jar_path
        self.java_bin = java_bin
        self.xmx = xmx
        self.work_dir = work_dir or tempfile.gettempdir()
        self.runner = runner
        self.last_details = None

    def _run(self, in_path: str, out_path: str, cache_dir: str) -> None:
        if self.runner is not None:
            self.runner(in_path, out_path, cache_dir)
            return
        cmd = [self.java_bin, "-jar", f"-Xmx{self.xmx}", self.jar_path,
               in_path, "-cache", cache_dir, "-out", out_path,
               "-subset", "-silent"]
        subprocess.check_call(cmd)

    def compute_score(self, gts: Dict, res: Dict):
        data = _assemble_input(gts, res)
        image_ids = [d["image_id"] for d in data]
        os.makedirs(self.work_dir, exist_ok=True)
        cache_dir = os.path.join(self.work_dir, "spice_cache")
        os.makedirs(cache_dir, exist_ok=True)
        results, _ = _file_handoff(
            data, lambda i, o: self._run(i, o, cache_dir), self.work_dir
        )
        mean, sent, details = _parse_output(results, image_ids)
        self.last_details = details
        return mean, sent


class SpiceHTTPScorer:
    """SPICE via a persistent service speaking the reference's file-handoff
    protocol (spiceD.py:66-73): the service reads `in`, writes `out`, and
    responds with the output JSON body. Requires a shared filesystem with
    the service, exactly like the reference deployment."""

    def __init__(self, ip: str = "localhost", port: int = 8090,
                 work_dir: Optional[str] = None, timeout: float = 600.0):
        self.ip = ip
        self.port = int(port)
        self.work_dir = work_dir or tempfile.gettempdir()
        self.timeout = timeout
        self.last_details = None

    def compute_score(self, gts: Dict, res: Dict):
        data = _assemble_input(gts, res)
        image_ids = [d["image_id"] for d in data]
        os.makedirs(self.work_dir, exist_ok=True)
        cache_dir = os.path.join(self.work_dir, f"spice_cache_{self.port}")
        os.makedirs(cache_dir, exist_ok=True)

        def invoke(in_path, out_path):
            query = urllib.parse.urlencode(
                {"in": in_path, "out": out_path, "cache": cache_dir,
                 "subset": 1, "silent": 1}
            )
            url = f"http://{self.ip}:{self.port}/test?{query}"
            body = urllib.request.urlopen(url, timeout=self.timeout).read()
            # the reference service responds with the result JSON AND writes
            # the out file; prefer the file (spiceD.py:86-88), fall back to
            # the body
            if os.path.getsize(out_path) == 0:
                with open(out_path, "w") as f:
                    f.write(body.decode())

        results, _ = _file_handoff(data, invoke, self.work_dir)
        mean, sent, details = _parse_output(results, image_ids)
        self.last_details = details
        return mean, sent


def spice_fn_from_scorer(scorer, ix_to_word: Optional[Dict] = None):
    """Adapt a SPICE scorer to the RL reward combiner's `spice_fn` hook
    ((hyps, refs_per_hyp) int-id arrays -> per-hyp scores; see
    rewards/self_critical.py). Ids decode via ix_to_word when given,
    otherwise to id-strings — the reference feeds SPICE id-strings too
    (get_rewards.py:20-26 array_to_str output goes to every scorer)."""
    from ..rewards.cider_d import trim_with_eos

    def to_sentence(ids) -> str:
        toks = [int(t) for t in trim_with_eos(ids) if t != 0]
        if ix_to_word is None:
            return " ".join(str(t) for t in toks)
        return " ".join(ix_to_word.get(str(t), "UNK") for t in toks)

    def spice_fn(hyps, refs_per_hyp):
        gts = {i: [to_sentence(r) for r in refs]
               for i, refs in enumerate(refs_per_hyp)}
        res = {i: [to_sentence(h)] for i, h in enumerate(hyps)}
        _, sent = scorer.compute_score(gts, res)
        # scorers emit per-image scores in STRING-sorted id order
        # (0,1,10,11,...,2,...); the reward combiner consumes positionally,
        # so invert the permutation back to hyp order
        order = sorted(res.keys(), key=str)
        by_id = dict(zip(order, sent))
        scores = np.asarray([by_id[i] for i in range(len(hyps))], np.float64)
        # a scorer may emit NaN for undefined pairs (e.g. the jar/approx
        # convention when both scene graphs are empty); ONE NaN reward
        # poisons the whole batch's policy gradient — score those rows 0
        return np.nan_to_num(scores, nan=0.0)

    return spice_fn


def make_spice_fn(opt, ix_to_word):
    """The trainers' SPICE reward hook for --spice_weight > 0, selected by
    --spice_backend:

      * 'approx' (default): the in-repo pure-Python approximate scorer
        (metrics/spice_approx.py) — works out of the box, no service.
      * 'http': the reference deployment — an external service at
        --ip/--port speaking the spiceD file-handoff protocol
        (spiceD.py:30-114). `rfnet-spice-server` provides an in-repo
        implementation of that service; a real spice-1.0.jar service is
        drop-in identical.
    """
    backend = getattr(opt, "spice_backend", "approx")
    if backend == "approx":
        from .spice_approx import SpiceApprox

        return spice_fn_from_scorer(SpiceApprox(), ix_to_word)
    if backend == "http":
        return spice_fn_from_scorer(
            SpiceHTTPScorer(opt.ip, opt.port), ix_to_word
        )
    raise ValueError(f"unknown spice_backend {backend!r} "
                     "(expected 'approx' or 'http')")
