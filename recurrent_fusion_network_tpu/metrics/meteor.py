"""METEOR (approximate, Java-free).

The reference runs the official meteor-1.5.jar as a persistent subprocess
(coco-caption/pycocoevalcap/meteor/meteor.py:17-47). This is a pure-Python
implementation of the METEOR algorithm (Banerjee & Lavie 2005 / Denkowski &
Lavie 2014) with documented simplifications:

  * match stages: EXACT and STEM (Porter) — the official synonym (WordNet)
    and paraphrase-table stages are omitted (those data files cannot ship
    here), so scores are a close lower bound of official METEOR;
  * alignment: the jar's objective — maximize matches, then MINIMIZE chunks
    — solved exactly by budgeted branch-and-bound (caption-length sentences
    explore a tiny search space); inputs exceeding the node budget fall back
    to left-to-right greedy matching (tests/test_metrics_rewards.py
    quantifies the greedy-vs-optimal gap on a fixture).

Classic parameters alpha=0.9, beta=3.0, gamma=0.5:
  F_mean  = P*R / (alpha*P + (1-alpha)*R)
  penalty = gamma * (chunks / matches)^beta
  score   = F_mean * (1 - penalty), maximized over references.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from .stemmer import stem

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5
NODE_BUDGET = 50_000  # branch-and-bound search cap before greedy fallback


def _align_greedy(hyp: Sequence[str], ref: Sequence[str]) -> List[int]:
    """hyp-position -> ref-position (-1 unmatched); exact stage then stem."""
    match = [-1] * len(hyp)
    used = [False] * len(ref)
    for stage in (lambda w: w, stem):
        h_keys = [stage(w) for w in hyp]
        r_keys = [stage(w) for w in ref]
        for i, hk in enumerate(h_keys):
            if match[i] >= 0:
                continue
            for j, rk in enumerate(r_keys):
                if not used[j] and hk == rk:
                    match[i] = j
                    used[j] = True
                    break
    return match


def _candidates(hyp: Sequence[str], ref: Sequence[str]) -> List[List[int]]:
    """Per hyp position, ref positions matchable by ANY stage (exact|stem)."""
    h_exact, r_exact = list(hyp), list(ref)
    h_stem = [stem(w) for w in hyp]
    r_stem = [stem(w) for w in ref]
    out = []
    for i in range(len(hyp)):
        cs = [
            j
            for j in range(len(ref))
            if h_exact[i] == r_exact[j] or h_stem[i] == r_stem[j]
        ]
        out.append(cs)
    return out


def _align(hyp: Sequence[str], ref: Sequence[str]) -> List[int]:
    """Alignment maximizing matches then minimizing chunks (the meteor jar's
    selection rule); falls back to greedy past NODE_BUDGET search nodes."""
    cands = _candidates(hyp, ref)
    n = len(hyp)
    # last hyp position that can use each ref position (dominance prune)
    last_user = {}
    for i in range(n):
        for j in cands[i]:
            last_user[j] = i

    best = {"match": None, "count": -1, "chunks": 10**9, "nodes": 0}
    used = [False] * len(ref)
    match = [-1] * n
    # upper bound on future matches from position i
    suffix_possible = [0] * (n + 1)
    for i in range(n - 1, -1, -1):
        suffix_possible[i] = suffix_possible[i + 1] + (1 if cands[i] else 0)

    def chunks_of(m):
        c, prev = 0, None
        for j in m:
            if j < 0:
                prev = None
                continue
            if prev is None or j != prev + 1:
                c += 1
            prev = j
        return c

    def dfs(i, count):
        best["nodes"] += 1
        if best["nodes"] > NODE_BUDGET:
            return
        if count + suffix_possible[i] < best["count"]:
            return  # cannot reach the current best match count
        if i == n:
            ch = chunks_of(match)
            if count > best["count"] or (
                count == best["count"] and ch < best["chunks"]
            ):
                best["count"], best["chunks"] = count, ch
                best["match"] = list(match)
            return
        # try continuing the current run first (adjacency -> fewer chunks)
        available = [j for j in cands[i] if not used[j]]
        order = sorted(
            available, key=lambda j: (i == 0 or match[i - 1] != j - 1, j)
        )
        for j in order:
            used[j] = True
            match[i] = j
            dfs(i + 1, count + 1)
            used[j] = False
            match[i] = -1
        # leave-unmatched branch: strictly count-dominated when some
        # available candidate is needed by NO later position (matching it
        # costs nothing downstream) — prune those; keeps the search
        # near-linear on typical captions
        if not any(last_user[j] <= i for j in available):
            dfs(i + 1, count)

    dfs(0, 0)
    if best["match"] is None:
        return _align_greedy(hyp, ref)
    if best["nodes"] > NODE_BUDGET:
        # truncated search: keep whichever of (partial-search best, greedy)
        # wins on the (count, -chunks) objective
        g = _align_greedy(hyp, ref)
        g_count = sum(1 for j in g if j >= 0)
        if (g_count, -chunks_of(g)) > (best["count"], -best["chunks"]):
            return g
    return best["match"]


def _chunks(match: List[int]) -> int:
    """Number of contiguous aligned runs (monotone adjacency in both)."""
    n = 0
    prev = None
    for i, j in enumerate(match):
        if j < 0:
            prev = None
            continue
        if prev is None or j != prev + 1:
            n += 1
        prev = j
    return n


def meteor_sentence(hyp: Sequence[str], refs: List[Sequence[str]]) -> float:
    best = 0.0
    for ref in refs:
        if not hyp or not ref:
            continue
        match = _align(hyp, ref)
        m = sum(1 for j in match if j >= 0)
        if m == 0:
            continue
        p = m / len(hyp)
        r = m / len(ref)
        f_mean = p * r / (ALPHA * p + (1 - ALPHA) * r)
        frag = _chunks(match) / m
        score = f_mean * (1 - GAMMA * frag**BETA)
        best = max(best, score)
    return best


def compute_meteor(gts: Dict, res: Dict):
    """pycocoevalcap-style surface: (mean, per-sentence scores)."""
    import numpy as np

    keys = sorted(gts.keys(), key=str)
    scores = [
        meteor_sentence(res[k][0].split(), [r.split() for r in gts[k]]) for k in keys
    ]
    return float(np.mean(scores)) if scores else 0.0, scores
