"""Sharded columnar feature store.

``PackedFeatureSource`` (dataset.py) consolidates each (variant) into one
memory-mapped array — right for a single host, but a many-host fleet should
not have every process open (and page-cache) one monolithic file per variant.
This store splits the corpus into fixed-size row shards, each a single binary
file laid out variant-major/column-major:

  root/
    manifest.json              ids (global row order), dims, variants,
                               shard_size, per-shard row counts
    shard-00000.bin            for each variant v, in manifest order:
    shard-00001.bin              [fc block:  count x D      f32]
    ...                          [att block: count x A x C  f32]

A batch read is a positioned-read gather: rows are grouped by shard and
fetched with one native call per (shard, column) — ``data/native``'s
``gather_rows`` fans pread()s over a thread pool without holding the GIL —
falling back to numpy memmap slices when no C++ toolchain is available.
Each host only ever opens the shards its rows live in.

TPU-native replacement for the IO half of the reference's BlobFetcher
(dataloader.py:395-624: multiprocessing.Pool(8) of per-image np.load calls
over 123k-file directories, 10 variant dirs per encoder); the arrayrecord/
TFRecord conversion SURVEY.md §7 prescribes, without the external dep.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_F32 = 4  # bytes


class ShardedFeatureSource:
    """Reader over a sharded columnar feature store (see module docstring).

    load(image_id, variant)      -> (fc (D,), att (A, C))   [loader contract]
    load_batch(image_ids, variants) -> (fc (n, D), att (n, A, C))
    """

    def __init__(self, root: str, *, use_native: bool = True, io_threads: int = 8):
        self.root = root
        with open(os.path.join(root, "manifest.json")) as f:
            m = json.load(f)
        # real exceptions, not asserts: format checks must survive python -O,
        # and a layout mismatch must error rather than read plausible garbage
        if m.get("version") != 1:
            raise ValueError(f"unknown store version {m.get('version')}")
        self.fc_dim: int = m["fc_dim"]
        self.att_num: int = m["att_num"]
        self.att_dim: int = m["att_dim"]
        self.variants: List[str] = m["variants"]
        self._variant_ix = {v: i for i, v in enumerate(self.variants)}
        self.shard_size: int = m["shard_size"]
        self.shards: List[dict] = m["shards"]
        self.ids: List = m["ids"]
        # _locate maps rows with r // shard_size while _offsets trusts the
        # per-shard counts — the two only agree when every non-final shard
        # holds exactly shard_size rows and the counts sum to len(ids). An
        # inconsistent manifest (hand-repaired store, truncated re-pack)
        # must fail HERE, not silently return the wrong feature rows.
        counts = [int(s["count"]) for s in self.shards]
        if any(c != self.shard_size for c in counts[:-1]) or (
            counts and not 0 < counts[-1] <= self.shard_size
        ) or sum(counts) != len(self.ids):
            raise ValueError(
                f"inconsistent manifest: shard counts {counts} vs "
                f"shard_size {self.shard_size} and {len(self.ids)} ids"
            )
        self.row: Dict = {image_id: r for r, image_id in enumerate(self.ids)}
        self.io_threads = io_threads
        self._lib = None
        if use_native:
            from .native import load_library

            self._lib = load_library()
        self._mmaps: Dict[int, np.ndarray] = {}
        # distinct shard files this process touched (many-host locality
        # diagnostic: a host sharded loader should only open the shards its
        # rows live in)
        self._seen_shards: set = set()

    @property
    def shards_opened(self) -> int:
        return len(self._seen_shards)

    # -------------------------------------------------------------- geometry

    def _locate(self, image_id) -> Tuple[int, int]:
        r = self.row[image_id]
        return r // self.shard_size, r % self.shard_size

    def _offsets(self, shard: int, vi: int) -> Tuple[int, int]:
        """(fc_block_start, att_block_start) byte offsets inside the shard."""
        c = self.shards[shard]["count"]
        per_variant = c * (self.fc_dim + self.att_num * self.att_dim) * _F32
        base = vi * per_variant
        return base, base + c * self.fc_dim * _F32

    def _path(self, shard: int) -> str:
        return os.path.join(self.root, self.shards[shard]["file"])

    # ----------------------------------------------------------------- reads

    def load(self, image_id, variant: str = "original"):
        fc, att = self.load_batch([image_id], [variant])
        return fc[0], att[0]

    def load_batch(
        self, image_ids: Sequence, variants: Optional[Sequence[str]] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(image_ids)
        if variants is None:
            variants = ["original"] * n
        if len(variants) != n:  # not an assert: must survive python -O
            raise ValueError(f"{len(variants)} variants for {n} image ids")
        D, A, C = self.fc_dim, self.att_num, self.att_dim
        fc_out = np.empty((n, D), np.float32)
        att_out = np.empty((n, A, C), np.float32)

        # group batch positions by (shard, variant): one gather per group
        groups: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
        for i, (image_id, v) in enumerate(zip(image_ids, variants)):
            shard, local = self._locate(image_id)
            groups.setdefault((shard, self._variant_ix[v]), []).append((i, local))

        for (shard, vi), members in groups.items():
            idx = np.array([m[0] for m in members])
            local = np.array([m[1] for m in members], np.int64)
            fc_base, att_base = self._offsets(shard, vi)
            if self._lib is not None:
                fc_rows = self._gather_native(
                    shard, fc_base + local * (D * _F32), len(members), D * _F32
                ).reshape(-1, D)
                att_rows = self._gather_native(
                    shard, att_base + local * (A * C * _F32), len(members),
                    A * C * _F32,
                ).reshape(-1, A, C)
            else:
                mm = self._mmap(shard)
                fc_rows = np.stack(
                    [mm[o // _F32 : o // _F32 + D]
                     for o in (fc_base + local * (D * _F32))]
                )
                att_rows = np.stack(
                    [mm[o // _F32 : o // _F32 + A * C]
                     for o in (att_base + local * (A * C * _F32))]
                ).reshape(-1, A, C)
            fc_out[idx] = fc_rows
            att_out[idx] = att_rows
        return fc_out, att_out

    def _gather_native(self, shard: int, offsets: np.ndarray, n: int,
                       row_bytes: int) -> np.ndarray:
        import ctypes

        self._seen_shards.add(shard)
        if row_bytes % _F32:
            # the C side writes n*row_bytes bytes into `out`; a non-multiple
            # of 4 would make the floor-divided f32 buffer too SHORT — heap
            # corruption, not an exception. No current caller does this;
            # guard the boundary for future column types.
            raise ValueError(f"row_bytes {row_bytes} must be f32-aligned")
        out = np.empty(n * (row_bytes // _F32), np.float32)
        offsets = np.ascontiguousarray(offsets, np.int64)
        rc = self._lib.gather_rows(
            self._path(shard).encode(),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            row_bytes,
            out.ctypes.data_as(ctypes.c_char_p),
            self.io_threads,
        )
        if rc != 0:
            raise OSError(-rc, f"gather_rows failed on {self._path(shard)}")
        return out

    def _mmap(self, shard: int) -> np.ndarray:
        if shard not in self._mmaps:
            self._seen_shards.add(shard)
            self._mmaps[shard] = np.memmap(
                self._path(shard), dtype=np.float32, mode="r"
            )
        return self._mmaps[shard]

    # ---------------------------------------------------------------- writer

    @staticmethod
    def write(
        root: str,
        ids: Sequence,
        fc_by_variant: Dict[str, np.ndarray],
        att_by_variant: Dict[str, np.ndarray],
        *,
        shard_size: int = 4096,
    ) -> "ShardedFeatureSource":
        """Create a store from in-memory (N, D) fc and (N, A, C) att arrays
        per variant (same variant sets; rows in `ids` order)."""
        # real exceptions, not asserts: a store written under python -O with
        # mismatched inputs would otherwise serve silently-corrupt rows
        variants = sorted(fc_by_variant)
        if sorted(att_by_variant) != variants:
            raise ValueError("fc/att variant sets differ")
        n = len(ids)
        fc0 = np.asarray(fc_by_variant[variants[0]])
        att0 = np.asarray(att_by_variant[variants[0]])
        if fc0.shape[0] != n or att0.shape[0] != n:
            raise ValueError(
                f"row counts {fc0.shape[0]}/{att0.shape[0]} != len(ids) {n}"
            )
        D, (A, C) = fc0.shape[1], att0.shape[1:]

        os.makedirs(root, exist_ok=True)
        shards = []
        for s, lo in enumerate(range(0, n, shard_size)):
            hi = min(lo + shard_size, n)
            fname = f"shard-{s:05d}.bin"
            with open(os.path.join(root, fname), "wb") as f:
                for v in variants:
                    fc = np.ascontiguousarray(fc_by_variant[v][lo:hi], np.float32)
                    att = np.ascontiguousarray(att_by_variant[v][lo:hi], np.float32)
                    if fc.shape != (hi - lo, D) or att.shape != (hi - lo, A, C):
                        raise ValueError(
                            f"variant '{v}' rows [{lo}:{hi}] have shapes "
                            f"{fc.shape}/{att.shape}, want "
                            f"{(hi - lo, D)}/{(hi - lo, A, C)}"
                        )
                    f.write(fc.tobytes())
                    f.write(att.tobytes())
            shards.append({"file": fname, "count": hi - lo})

        manifest = {
            "version": 1,
            "fc_dim": int(D),
            "att_num": int(A),
            "att_dim": int(C),
            "variants": variants,
            "shard_size": int(shard_size),
            "shards": shards,
            "ids": list(ids),
        }
        with open(os.path.join(root, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        return ShardedFeatureSource(root)


def pack_to_shards(packed_root: str, out_root: str, *, shard_size: int = 4096):
    """Convert a PackedFeatureSource directory into a sharded store."""
    from .dataset import PackedFeatureSource

    src = PackedFeatureSource(packed_root)
    ids = [None] * len(src.row)
    for image_id, r in src.row.items():
        ids[r] = image_id
    variants = sorted(
        f[: -len("_fc.npy")]
        for f in os.listdir(packed_root)
        if f.endswith("_fc.npy")
    )
    fc_by_variant, att_by_variant = {}, {}
    for v in variants:
        fc, att = src._arrays(v)
        fc_by_variant[v], att_by_variant[v] = fc, att
    return ShardedFeatureSource.write(
        out_root, ids, fc_by_variant, att_by_variant, shard_size=shard_size
    )
