"""Vectorized CIDEr-D over int token-id sequences — the RL reward kernel.

The reference scores rewards by converting sampled id arrays to strings and
running a dict-of-string-tuples scorer (get_rewards.py:20-26 +
ciderD_scorer.py:114-199) — the CPU hot spot of SCST training (SURVEY.md
§3.2). This implementation:

  * hashes n-grams of int ids into int64 keys (no string building, no tuple
    hashing in the hot path),
  * represents each sentence's tf-idf vector as sorted (key, weight) arrays
    and computes the clipped cosine with `np.intersect1d`,
  * computes each distinct image's reference vectors ONCE per batch (the
    reference recomputes them for every duplicated entry).

Semantics (EOS inclusion, idf weighting, clipping, Gaussian length penalty,
x10 scaling) match the reference scorer; see metrics/cider.py for the
slow-but-obviously-correct engine it is tested against.
"""

from __future__ import annotations

import math
import os
import pickle
from typing import Dict, List, Sequence, Tuple

import numpy as np

N_MAX = 4
KEY_BASE = np.int64(1) << 15  # token ids must be < 32768
_N_TAG = np.int64(1) << 60  # disambiguates n-gram order in the key space


def hash_ngrams(toks: np.ndarray, n_max: int = N_MAX):
    """(keys, counts, bigram_length) for all 1..n_max-grams of one sentence.

    Key for (t1..tk): tag(k) + ((t1*B + t2)*B + ...); unique per ngram since
    ids < B and order is tagged.
    """
    toks = np.asarray(toks, np.int64)
    L = len(toks)
    keys_per_n = []
    counts_per_n = []
    length = 0
    for n in range(1, n_max + 1):
        m = L - n + 1
        if m <= 0:
            keys_per_n.append(np.empty(0, np.int64))
            counts_per_n.append(np.empty(0, np.int64))
            continue
        k = toks[:m].copy()
        for j in range(1, n):
            k = k * KEY_BASE + toks[j : j + m]
        k += _N_TAG * n
        u, c = np.unique(k, return_counts=True)
        keys_per_n.append(u)
        counts_per_n.append(c)
        if n == 2:
            length = m  # the reference's bigram-count 'length' quirk
    return keys_per_n, counts_per_n, length


def hash_ngram_tuple(gram: Tuple[int, ...]) -> int:
    k = np.int64(0)
    for t in gram:
        k = k * KEY_BASE + np.int64(t)
    return int(k + _N_TAG * len(gram))


def trim_with_eos(ids) -> np.ndarray:
    """Tokens up to and INCLUDING the first 0 (array_to_str semantics,
    get_rewards.py:20-26)."""
    ids = np.asarray(ids).ravel()
    nz = np.nonzero(ids == 0)[0]
    end = int(nz[0]) + 1 if len(nz) else len(ids)
    return ids[:end].astype(np.int64)


class _SentVec:
    __slots__ = ("keys", "weights", "norms", "length")

    def __init__(self, keys, weights, norms, length):
        self.keys = keys  # list of n sorted int64 arrays
        self.weights = weights  # list of n float64 arrays
        self.norms = norms  # (n,) float64
        self.length = length


class CiderD:
    """Fixed-idf CIDEr-D scorer (train-idf RL mode, ciderD_scorer.py:60-68).

    df: {int-ngram-tuple: doc_freq} (from data/prepro_ngrams.py) or a
    pre-hashed {int64: float} dict. ref_len: log(#train images).
    """

    def __init__(
        self,
        df: Dict,
        ref_len: float,
        n: int = N_MAX,
        sigma: float = 6.0,
        backend: str = "auto",
        n_threads: int = 0,
    ):
        if not 1 <= n <= N_MAX:
            # the int64 key packs n 15-bit token digits under a 2^60 order
            # tag — exactly four fit. n=5 would overflow: silent wraparound
            # aliasing in numpy, signed-overflow UB in the C++ engine.
            raise ValueError(f"n must be in [1, {N_MAX}] (int64 key capacity)")
        self.n = n
        self.sigma = sigma
        self.ref_len = float(ref_len)
        if df and isinstance(next(iter(df.keys())), tuple):
            self.df = {hash_ngram_tuple(g): float(v) for g, v in df.items()}
        else:
            self.df = dict(df)
        # array form for vectorized lookup
        if self.df:
            ks = np.fromiter(self.df.keys(), np.int64, len(self.df))
            vs = np.fromiter(self.df.values(), np.float64, len(self.df))
            order = np.argsort(ks)
            self._df_keys = ks[order]
            self._df_vals = np.log(np.maximum(1.0, vs[order]))
        else:
            self._df_keys = np.empty(0, np.int64)
            self._df_vals = np.empty(0, np.float64)

        # optional C++ backend (rewards/native/cider_d.cpp)
        self._native = None
        self._native_ctx = None
        if backend in ("auto", "native"):
            from .native import load_library

            lib = load_library()
            if lib is None:
                if backend == "native":
                    raise RuntimeError("native CIDEr-D backend unavailable (no g++?)")
            else:
                import ctypes

                keys = np.ascontiguousarray(self._df_keys)
                vals = np.ascontiguousarray(self._df_vals)
                ctx = lib.cider_init(
                    keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    len(keys), self.ref_len, self.n, self.sigma,
                )
                self._native = lib
                self._native_ctx = ctx
                self._native_refs = (keys, vals)  # keep buffers alive
                self._n_threads = n_threads or min(8, os.cpu_count() or 1)

    def __del__(self):
        if getattr(self, "_native", None) is not None and self._native_ctx:
            try:
                self._native.cider_free(self._native_ctx)
            except Exception:
                pass
            self._native_ctx = None

    @classmethod
    def from_pickle(cls, path: str, **kw):
        with open(path, "rb") as f:
            d = pickle.load(f)
        return cls(d["document_frequency"], d["ref_len"], **kw)

    # ------------------------------------------------------------ internals

    def _log_df(self, keys: np.ndarray) -> np.ndarray:
        """log(max(1, df)) per key; unseen ngrams get log(1)=0."""
        idx = np.searchsorted(self._df_keys, keys)
        idx = np.clip(idx, 0, max(len(self._df_keys) - 1, 0))
        out = np.zeros(len(keys))
        if len(self._df_keys):
            hit = self._df_keys[idx] == keys
            out[hit] = self._df_vals[idx[hit]]
        return out

    def _vec(self, ids) -> _SentVec:
        toks = trim_with_eos(ids)
        keys_per_n, counts_per_n, length = hash_ngrams(toks, self.n)
        weights, norms = [], np.zeros(self.n)
        for n in range(self.n):
            k, c = keys_per_n[n], counts_per_n[n]
            w = c * (self.ref_len - self._log_df(k))
            weights.append(w)
            norms[n] = math.sqrt(float(np.dot(w, w)))
        return _SentVec(keys_per_n, weights, norms, length)

    def _sim(self, h: _SentVec, r: _SentVec) -> float:
        val = 0.0
        for n in range(self.n):
            if h.norms[n] == 0 or r.norms[n] == 0:
                continue
            _, hi, ri = np.intersect1d(
                h.keys[n], r.keys[n], assume_unique=True, return_indices=True
            )
            if len(hi) == 0:
                continue
            hw, rw = h.weights[n][hi], r.weights[n][ri]
            acc = float(np.sum(np.minimum(hw, rw) * rw))
            val += acc / (h.norms[n] * r.norms[n])
        delta = float(h.length - r.length)
        return val * math.exp(-(delta**2) / (2 * self.sigma**2))

    # --------------------------------------------------------------- public

    def score_arrays(
        self,
        hyps: Sequence[np.ndarray],
        refs_per_hyp: Sequence[Sequence[np.ndarray]],
        ref_cache_keys: Sequence | None = None,
    ) -> np.ndarray:
        """Score each hyp against its reference set.

        ref_cache_keys: optional hashable per hyp identifying its reference
        set; duplicated sets (e.g. seq_per_img expansion) are vectorized once.
        """
        # n-gram key packing allots KEY_BASE slots per token position; a
        # vocabulary beyond that would silently alias keys and corrupt
        # scores. Both sides of the comparison must be validated: refs carry
        # the full caption vocabulary even when the sampled hyps happen to
        # use small ids only. This guard sits on the SCST per-iteration hot
        # path (every reward call), so it must not do per-row numpy calls:
        # seq_per_img expansion repeats the same reference ARRAY OBJECT many
        # times — dedup by id() and take one min/max over each whole array
        # (measured: the old per-row generator was ~half the reward cost on
        # the 1-CPU bench host).
        hi, lo = 0, 0
        seen: set = set()
        for a in list(hyps) + [r for rs in refs_per_hyp for r in rs]:
            if id(a) in seen or not np.size(a):
                continue
            seen.add(id(a))
            a = np.asarray(a)
            hi = max(hi, int(a.max()))
            lo = min(lo, int(a.min()))
        if hi >= KEY_BASE:
            raise ValueError(
                f"token id {hi} >= KEY_BASE ({int(KEY_BASE)}); n-gram hashing "
                "would alias — raise KEY_BASE in rewards/cider_d.py"
            )
        # negative ids alias too ((5,-1) hashes like (4, KEY_BASE-1)), and
        # trim_with_eos only stops at 0 so e.g. -1 padding would reach the
        # hash; the repo uses -1 padding elsewhere (top_words), so guard it
        if lo < 0:
            raise ValueError(
                f"negative token id {lo}: n-gram hashing requires ids in "
                f"[0, KEY_BASE) — pad with 0 (EOS), not -1"
            )
        # empty reference groups: the numpy engine would raise
        # ZeroDivisionError but the native one computes 0.0/0.0 = NaN and
        # silently poisons the whole batch's policy gradient — fail loudly
        # in BOTH engines before scoring
        for i, rs in enumerate(refs_per_hyp):
            if len(rs) == 0:
                raise ValueError(f"empty reference set for hypothesis {i}")
        if self._native_ctx is not None:
            return self._score_native(hyps, refs_per_hyp, ref_cache_keys)
        cache: Dict = {}
        scores = np.zeros(len(hyps))
        for i, hyp in enumerate(hyps):
            hv = self._vec(hyp)
            ck = ref_cache_keys[i] if ref_cache_keys is not None else i
            if ck not in cache:
                cache[ck] = [self._vec(r) for r in refs_per_hyp[i]]
            rvs = cache[ck]
            total = sum(self._sim(hv, rv) for rv in rvs)
            scores[i] = total / self.n / len(rvs) * 10.0
        return scores

    def _score_native(self, hyps, refs_per_hyp, ref_cache_keys):
        import ctypes

        n_hyp = len(hyps)
        # group reference sets by cache key (flatten each set once)
        group_of = {}
        groups: List = []
        hyp_group = np.empty(n_hyp, np.int64)
        for i in range(n_hyp):
            ck = ref_cache_keys[i] if ref_cache_keys is not None else i
            if ck not in group_of:
                group_of[ck] = len(groups)
                groups.append(refs_per_hyp[i])
            hyp_group[i] = group_of[ck]

        def flatten(sents):
            # fast path: uniform-length 1-D rows (the SCST case — every
            # rollout row is (T,)) collapse to one 2-D copy instead of a
            # per-row Python loop (hot path, see score_arrays guard note)
            n = len(sents)
            first_len = len(np.ravel(sents[0])) if n else 0
            if n and all(
                getattr(s, "ndim", None) == 1 and len(s) == first_len
                for s in sents
            ):
                flat = np.asarray(sents, np.int32).ravel()
                off = np.arange(n + 1, dtype=np.int64) * first_len
                return flat, off
            off = np.zeros(n + 1, np.int64)
            for i, s in enumerate(sents):
                off[i + 1] = off[i] + len(np.ravel(s))
            flat = np.empty(off[-1], np.int32)
            for i, s in enumerate(sents):
                flat[off[i] : off[i + 1]] = np.ravel(s)
            return flat, off

        hyp_flat, hyp_off = flatten(list(hyps))
        all_refs = [r for g in groups for r in g]
        ref_flat, ref_off = flatten(all_refs)
        group_off = np.zeros(len(groups) + 1, np.int64)
        for g, refs in enumerate(groups):
            group_off[g + 1] = group_off[g] + len(refs)

        out = np.zeros(n_hyp, np.float64)
        I64 = ctypes.POINTER(ctypes.c_int64)
        I32 = ctypes.POINTER(ctypes.c_int32)
        F64 = ctypes.POINTER(ctypes.c_double)
        self._native.cider_score(
            self._native_ctx,
            hyp_flat.ctypes.data_as(I32), hyp_off.ctypes.data_as(I64), n_hyp,
            ref_flat.ctypes.data_as(I32), ref_off.ctypes.data_as(I64), len(all_refs),
            group_off.ctypes.data_as(I64), len(groups),
            hyp_group.ctypes.data_as(I64),
            out.ctypes.data_as(F64), self._n_threads,
        )
        return out

    def compute_score(self, gts: Dict, res: List[Dict]) -> Tuple[float, np.ndarray]:
        """Reference-compatible surface (ciderD.py:27): gts maps entry id ->
        list of id-strings; res is [{'image_id': i, 'caption': [id-string]}]."""
        hyps, refs, keys = [], [], []
        for entry in res:
            i = entry["image_id"]
            hyps.append(_parse(entry["caption"][0]))
            refs.append([_parse(s) for s in gts[i]])
            keys.append(id(gts[i]))
        scores = self.score_arrays(hyps, refs, keys)
        return float(np.mean(scores)), scores


def _parse(s: str) -> np.ndarray:
    return np.array([int(t) for t in s.split()], np.int64) if s else np.zeros(0, np.int64)
