"""METEOR (approximate, Java-free).

The reference runs the official meteor-1.5.jar as a persistent subprocess
(coco-caption/pycocoevalcap/meteor/meteor.py:17-47). This is a pure-Python
implementation of the METEOR algorithm (Banerjee & Lavie 2005 / Denkowski &
Lavie 2014) with documented simplifications:

  * match stages: EXACT and STEM (Porter) — the official synonym (WordNet)
    and paraphrase-table stages are omitted (those data files cannot ship
    here), so scores are a close lower bound of official METEOR;
  * alignment: left-to-right greedy maximal matching per stage rather than
    the jar's beam-search chunk minimization.

Classic parameters alpha=0.9, beta=3.0, gamma=0.5:
  F_mean  = P*R / (alpha*P + (1-alpha)*R)
  penalty = gamma * (chunks / matches)^beta
  score   = F_mean * (1 - penalty), maximized over references.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from .stemmer import stem

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5


def _align(hyp: Sequence[str], ref: Sequence[str]) -> List[int]:
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
