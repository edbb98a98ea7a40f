"""Data-layer tests: batch contract, iterator/prefetch consistency, packed
feature storage, prepro scripts."""

import json
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from recurrent_fusion_network_tpu.data import (
    DataLoader,
    Dataset,
    PackedFeatureSource,
    decode_sequence,
)
from recurrent_fusion_network_tpu.data.prepro_labels import preprocess
from recurrent_fusion_network_tpu.data.prepro_ngrams import compute_doc_freq, seq_ngrams
from recurrent_fusion_network_tpu.data.synthetic import synthetic_dataset, synthetic_setup


class TestBatchContract:
    def test_feat_array_batch(self):
        opt, loader = synthetic_setup(caption_model="recurrent_fusion_model")
        data = loader.get_batch("train")
        B, spi, L = opt.batch_size, opt.seq_per_img, loader.seq_length
        assert len(data["fc_feats_array"]) == 3
        assert data["fc_feats_array"][0].shape == (B * spi, 16)
        assert data["att_feats_array"][1].shape == (B * spi, 4, 8)
        assert data["labels"].shape == (B * spi, L + 2)
        assert data["masks"].shape == (B * spi, L + 2)
        assert data["top_words"].shape == (B * spi, opt.top_words_count)
        assert len(data["gts"]) == B and len(data["infos"]) == B
        assert set(data["bounds"]) == {"it_pos_now", "it_max", "wrapped"}
        # labels zero-bordered
        assert (data["labels"][:, 0] == 0).all()
        # mask = #nonzero + 2 ones
        nz = (data["labels"] != 0).sum(1) + 2
        np.testing.assert_array_equal(data["masks"].sum(1), nz)
        # features repeated seq_per_img times per image
        fc = data["fc_feats_array"][0]
        for i in range(B):
            blk = fc[i * spi : (i + 1) * spi]
            assert (blk == blk[0]).all()

    def test_single_feature_batch(self):
        opt, loader = synthetic_setup(caption_model="show_tell")
        data = loader.get_batch("train")
        assert "fc_feats" in data and "att_feats" in data
        assert data["fc_feats"].ndim == 2

    def test_top_words_valid(self):
        opt, loader = synthetic_setup()
        data = loader.get_batch("train")
        tw = data["top_words"]
        ds = loader.dataset
        for r in range(tw.shape[0]):
            valid = tw[r][tw[r] >= 0]
            assert len(np.unique(valid)) == len(valid)
            # every listed top word appears in the caption
            cap_tops = set(ds.vocab_ix_to_top_ix[data["labels"][r]]) - {-1}
            assert set(valid) == cap_tops

    def test_gts_are_full_caption_sets(self):
        opt, loader = synthetic_setup()
        data = loader.get_batch("train")
        for info, g in zip(data["infos"], data["gts"]):
            np.testing.assert_array_equal(
                g, loader.dataset.captions_for_image(info["id"])
            )


class TestIterators:
    def test_epoch_wrap_and_shuffle(self):
        opt, loader = synthetic_setup(batch_size=8)
        n_train = len(loader.split_image_id["train"])
        seen = []
        wrapped = False
        for _ in range(n_train // 8 + 1):
            d = loader.get_batch("train")
            seen += [i["id"] for i in d["infos"]]
            wrapped = wrapped or d["bounds"]["wrapped"]
        assert wrapped
        # first epoch covered every image exactly once
        assert sorted(seen[:n_train]) == sorted(loader.split_image_id["train"]) or \
            len(set(seen[:n_train])) == n_train

    def test_prefetch_matches_sync(self):
        opt1, sync_loader = synthetic_setup(prefetch=False, seed=3)
        opt2, pre_loader = synthetic_setup(prefetch=True, seed=3)
        for _ in range(5):
            a = sync_loader.get_batch("train")
            b = pre_loader.get_batch("train")
            np.testing.assert_array_equal(a["labels"], b["labels"])
            np.testing.assert_array_equal(
                a["fc_feats_array"][0], b["fc_feats_array"][0]
            )
            assert a["bounds"] == b["bounds"]
        assert sync_loader.iterators == pre_loader.iterators
        pre_loader.close()

    def test_restore_state_resumes_exactly(self):
        opt, loader = synthetic_setup(seed=5)
        loader.get_batch("train")
        it = dict(loader.iterators)
        sid = {s: list(v) for s, v in loader.split_image_id.items()}
        next_batch = loader.get_batch("train")

        opt2, loader2 = synthetic_setup(seed=5)
        loader2.restore_state(it, sid)
        resumed = loader2.get_batch("train")
        assert [i["id"] for i in resumed["infos"]] == [
            i["id"] for i in next_batch["infos"]
        ]

    def test_restore_state_resumes_rng_draws_exactly(self):
        """Checkpoint/resume must be DRAW-exact, not just cursor-exact: with
        seq_per_img < captions-per-image every image costs a caption-slice
        draw (loader py-RNG), and use_flip/use_crop costs a variant draw
        (np-RNG) — real-COCO conditions. The rng_states snapshot rides with
        the consumed batch (the prefetch thread runs ahead), pickles like
        infos, and restores both streams so the resumed continuation equals
        the uninterrupted one batch-for-batch, features included."""
        kw = dict(seq_per_img=3, seed=11, prefetch=True,
                  use_flip=1, use_crop=1)
        opt, loader = synthetic_setup(**kw)
        for _ in range(3):
            loader.get_batch("train")
        state = pickle.loads(pickle.dumps((
            dict(loader.iterators),
            {s: list(v) for s, v in loader.split_image_id.items()},
            dict(loader.rng_states),
        )))
        cont = [loader.get_batch("train") for _ in range(3)]
        loader.close()

        # fresh loader, desynced by one consumed batch, then restored
        opt2, loader2 = synthetic_setup(**kw)
        loader2.get_batch("train")
        loader2.restore_state(*state)
        resumed = [loader2.get_batch("train") for _ in range(3)]
        loader2.close()
        for a, b in zip(cont, resumed):
            np.testing.assert_array_equal(a["labels"], b["labels"])
            np.testing.assert_array_equal(
                a["fc_feats_array"][0], b["fc_feats_array"][0]
            )
            assert a["bounds"] == b["bounds"]

        # vacuity guard: WITHOUT the rng snapshot the construction-seeded
        # streams produce different draws (old behavior — cursor-only).
        # prefetch=False here: with a prefetcher the live RNGs advance by
        # however far the producer thread ran ahead (racy — it can land
        # exactly on the captured position); synchronous assembly pins the
        # stale position to 1 batch vs the snapshot's 3.
        opt3, loader3 = synthetic_setup(**{**kw, "prefetch": False})
        loader3.get_batch("train")
        loader3.restore_state(state[0], state[1])
        stale = [loader3.get_batch("train") for _ in range(3)]
        loader3.close()
        assert any(
            not np.array_equal(a["labels"], b["labels"])
            or not np.array_equal(a["fc_feats_array"][0], b["fc_feats_array"][0])
            for a, b in zip(cont, stale)
        )

    def test_reset_iterator(self):
        opt, loader = synthetic_setup()
        first = loader.get_batch("val")
        loader.get_batch("val")
        loader.reset_iterator("val")
        again = loader.get_batch("val")
        assert [i["id"] for i in first["infos"]] == [i["id"] for i in again["infos"]]

    def test_reset_iterator_rewinds_live_rng_to_consumed(self):
        """The prefetcher over-runs consumption, advancing the live RNG
        streams past the consumed snapshot a checkpoint records.
        reset_iterator must rewind them, or post-reset variant/caption
        draws depend on prefetch timing and diverge from a resumed run
        (the eval splits hit this every periodic eval on real COCO)."""
        kw = dict(seq_per_img=3, seed=21, use_flip=1, use_crop=1)
        opt, pre = synthetic_setup(prefetch=True, **kw)
        opt2, sync = synthetic_setup(prefetch=False, **kw)
        for _ in range(2):
            pre.get_batch("val")
            sync.get_batch("val")
        pre.reset_iterator("val")
        sync.reset_iterator("val")
        # live streams equal the consumed snapshot, regardless of how far
        # the producer thread ran ahead before the reset stopped it
        assert pre._snapshot_rng("val") == pre.rng_states["val"]
        for _ in range(3):
            a, b = pre.get_batch("val"), sync.get_batch("val")
            np.testing.assert_array_equal(a["labels"], b["labels"])
            np.testing.assert_array_equal(
                a["fc_feats_array"][0], b["fc_feats_array"][0]
            )
        pre.close()
        sync.close()

    def test_direct_get_batch_does_not_race_or_skip(self):
        """An explicit-arg get_batch must stop a live prefetcher for the
        split and continue from the CONSUMED cursor — not race the producer
        thread or skip the images it pre-assembled."""
        kw = dict(seed=31, use_flip=1, seq_per_img=3)
        opt, pre = synthetic_setup(prefetch=True, **kw)
        opt2, sync = synthetic_setup(prefetch=False, **kw)
        a1, b1 = pre.get_batch("train"), sync.get_batch("train")
        np.testing.assert_array_equal(a1["labels"], b1["labels"])
        a2 = pre.get_batch("train", variant="flip")
        b2 = sync.get_batch("train", variant="flip")
        assert [i["id"] for i in a2["infos"]] == [i["id"] for i in b2["infos"]]
        np.testing.assert_array_equal(a2["labels"], b2["labels"])
        # the default (prefetched) path resumes cleanly afterwards
        a3, b3 = pre.get_batch("train"), sync.get_batch("train")
        np.testing.assert_array_equal(a3["labels"], b3["labels"])
        assert a3["bounds"] == b3["bounds"]
        pre.close()
        sync.close()



class TestPackedSource:
    def test_roundtrip(self, tmp_path):
        ids = [7, 9, 11]
        fc = np.random.default_rng(0).standard_normal((3, 5)).astype(np.float32)
        att = np.random.default_rng(1).standard_normal((3, 4, 6)).astype(np.float32)
        src = PackedFeatureSource.write(
            str(tmp_path / "pk"), ids, {"original": fc}, {"original": att}
        )
        f, a = src.load(9)
        np.testing.assert_array_equal(f, fc[1])
        np.testing.assert_array_equal(a, att[1])
        # fresh open reads the mmap
        src2 = PackedFeatureSource(str(tmp_path / "pk"))
        f2, _ = src2.load(11)
        np.testing.assert_array_equal(f2, fc[2])


class TestShardedSource:
    def _store(self, tmp_path, *, n=10, shard_size=3, use_native=True,
               variants=("original", "flip")):
        from recurrent_fusion_network_tpu.data.sharded import ShardedFeatureSource

        g = np.random.default_rng(0)
        ids = [100 + i for i in range(n)]
        fc = {v: g.standard_normal((n, 5)).astype(np.float32) for v in variants}
        att = {v: g.standard_normal((n, 4, 6)).astype(np.float32) for v in variants}
        ShardedFeatureSource.write(
            str(tmp_path / "sh"), ids, fc, att, shard_size=shard_size
        )
        src = ShardedFeatureSource(str(tmp_path / "sh"), use_native=use_native)
        return src, ids, fc, att

    def test_roundtrip_across_shards_and_variants(self, tmp_path):
        src, ids, fc, att = self._store(tmp_path)
        for r, image_id in enumerate(ids):
            for v in ("original", "flip"):
                f, a = src.load(image_id, v)
                np.testing.assert_array_equal(f, fc[v][r])
                np.testing.assert_array_equal(a, att[v][r])

    def test_batched_gather_matches_per_row(self, tmp_path):
        src, ids, fc, att = self._store(tmp_path)
        g = np.random.default_rng(1)
        order = g.permutation(len(ids))  # scattered across shards, unordered
        req_ids = [ids[i] for i in order]
        req_vs = [("original", "flip")[int(g.integers(0, 2))] for _ in order]
        fcs, atts = src.load_batch(req_ids, req_vs)
        for k, (i, v) in enumerate(zip(order, req_vs)):
            np.testing.assert_array_equal(fcs[k], fc[v][i])
            np.testing.assert_array_equal(atts[k], att[v][i])

    def test_numpy_fallback_matches_native(self, tmp_path):
        src_n, ids, _, _ = self._store(tmp_path, use_native=True)
        src_f, _, _, _ = self._store(tmp_path / "f", use_native=False)
        assert src_f._lib is None
        req = [ids[i] for i in (9, 0, 4, 4, 7)]
        vs = ["flip", "original", "flip", "original", "original"]
        for (a, b) in zip(src_n.load_batch(req, vs), src_f.load_batch(req, vs)):
            np.testing.assert_array_equal(a, b)

    def test_native_library_builds(self):
        from recurrent_fusion_network_tpu.data.native import load_library

        assert load_library() is not None, "g++ is baked in; build must work"

    def test_corrupt_cached_library_self_heals(self, tmp_path):
        """A truncated/garbage .so NEWER than the source (pre-atomic builds
        could leave one after a SIGTERM mid-link) must trigger a rebuild
        from source, not a permanent silent fallback to the slow path."""
        import os
        import time

        from recurrent_fusion_network_tpu.data.native import build

        lib_path = build._LIB
        backup = None
        if os.path.exists(lib_path):
            backup = lib_path + ".bak"
            os.replace(lib_path, backup)
        try:
            with open(lib_path, "wb") as f:
                f.write(b"\x7fELF garbage not a library")
            future = time.time() + 3600  # newer than the source
            os.utime(lib_path, (future, future))
            build._state.clear()
            lib = build.load_library()
            assert lib is not None, "corrupt cache must rebuild, not fail"
            assert hasattr(lib, "gather_rows")
        finally:
            build._state.clear()
            if backup:
                os.replace(backup, lib_path)

    def test_inconsistent_manifest_rejected(self, tmp_path):
        """_locate assumes every non-final shard holds exactly shard_size
        rows; a manifest violating that must raise, not silently read the
        wrong feature rows."""
        import json as _json

        from recurrent_fusion_network_tpu.data.sharded import (
            ShardedFeatureSource,
        )

        self._store(tmp_path, n=10, shard_size=3)
        man = tmp_path / "sh" / "manifest.json"
        m = _json.loads(man.read_text())
        m["shards"][0]["count"] = 2  # non-final shard short of shard_size
        man.write_text(_json.dumps(m))
        with pytest.raises(ValueError, match="inconsistent manifest"):
            ShardedFeatureSource(str(tmp_path / "sh"))

    def test_only_touched_shards_open(self, tmp_path):
        """A host reading a row subset opens only that subset's shard files
        (the many-host locality property)."""
        src, ids, _, _ = self._store(tmp_path, n=12, shard_size=3)
        src.load_batch([ids[0], ids[1], ids[10]])  # shards 0 and 3 only
        assert src.shards_opened == 2

    def test_loader_batches_identical_to_packed(self, tmp_path):
        """Same corpus via PackedFeatureSource and ShardedFeatureSource must
        produce byte-identical loader batches (same opt/seed/stream)."""
        from recurrent_fusion_network_tpu.data.loader import DataLoader
        from recurrent_fusion_network_tpu.data.sharded import ShardedFeatureSource
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.feat_registry import VARIANTS

        opt, base = synthetic_setup(caption_model="show_tell", batch_size=4,
                                    seq_per_img=2)
        opt.use_flip, opt.use_crop = 1, 1  # exercise variant picking
        ds = base.dataset
        ids = [img["id"] for img in ds.info["images"]]
        syn = base.sources[0]
        fc_by_v, att_by_v = {}, {}
        for v in VARIANTS:
            rows = [syn.load(i, v) for i in ids]
            fc_by_v[v] = np.stack([r[0] for r in rows])
            att_by_v[v] = np.stack([r[1] for r in rows])
        sharded = ShardedFeatureSource.write(
            str(tmp_path / "sh"), ids, fc_by_v, att_by_v, shard_size=4
        )
        from recurrent_fusion_network_tpu.data.dataset import PackedFeatureSource

        packed = PackedFeatureSource.write(
            str(tmp_path / "pk"), ids, fc_by_v, att_by_v
        )

        la = DataLoader(opt, ds, [sharded], prefetch=False)
        lb = DataLoader(opt, ds, [packed], prefetch=False)
        for _ in range(5):
            a, b = la.get_batch("train"), lb.get_batch("train")
            np.testing.assert_array_equal(a["labels"], b["labels"])
            np.testing.assert_array_equal(a["fc_feats"], b["fc_feats"])
            np.testing.assert_array_equal(a["att_feats"], b["att_feats"])

    def test_pack_to_shards_conversion(self, tmp_path):
        from recurrent_fusion_network_tpu.data.sharded import pack_to_shards

        ids = [7, 9, 11, 13, 15]
        g = np.random.default_rng(3)
        fc = {"original": g.standard_normal((5, 4)).astype(np.float32)}
        att = {"original": g.standard_normal((5, 3, 2)).astype(np.float32)}
        PackedFeatureSource.write(str(tmp_path / "pk"), ids, fc, att)
        src = pack_to_shards(str(tmp_path / "pk"), str(tmp_path / "sh"),
                             shard_size=2)
        for r, image_id in enumerate(ids):
            f, a = src.load(image_id)
            np.testing.assert_array_equal(f, fc["original"][r])
            np.testing.assert_array_equal(a, att["original"][r])


class TestPrepro:
    def karpathy_fixture(self):
        g = np.random.default_rng(0)
        words = ["a", "man", "dog", "park", "ball", "runs", "big", "rare1", "rare2"]
        images = []
        for i in range(12):
            sents = []
            for j in range(5):
                n = int(g.integers(3, 7))
                toks = [words[int(g.integers(0, 7))] for _ in range(n)]
                if i == 0 and j == 0:
                    toks.append("rare1")  # count 1, below threshold -> UNK
                sents.append({"tokens": toks})
            images.append(
                {
                    "cocoid": 500 + i,
                    "split": ["train", "val", "test"][i % 3] if i > 5 else "train",
                    "filepath": "val2014",
                    "filename": f"img{i}.jpg",
                    "sentences": sents,
                }
            )
        return {"images": images}

    def test_preprocess_labels(self):
        info, labels, starts, ends, top = preprocess(
            self.karpathy_fixture(), max_length=6, word_count_threshold=2
        )
        assert labels.shape[1] == 6
        assert starts[0] == 1 and ends[-1] == labels.shape[0]
        assert "UNK" in info["ix_to_word"].values()
        # rare word maps to UNK
        vocab = set(info["ix_to_word"].values())
        assert "rare1" not in vocab
        ds = Dataset(info, labels, starts, ends, top)
        caps = ds.captions_for_image(500)
        assert caps.shape[0] == 5
        # decode roundtrip produces words from the vocab
        sents = decode_sequence(info["ix_to_word"], caps)
        for s in sents:
            assert all(w in vocab for w in s.split())

    def test_raw_sentences_recorded_and_preferred(self):
        """prepro records untruncated annotation text; eval gts must score
        against it (reference protocol: coco-caption reads the annotations
        JSON), not the truncated/UNKed label matrix."""
        fix = self.karpathy_fixture()
        # a sentence longer than max_length with a below-threshold word:
        # label matrix truncates + UNKs it, raw_sentences must not
        long_toks = ["a", "man", "dog", "park", "ball", "runs", "big",
                     "man", "dog", "rare2"]
        fix["images"][0]["sentences"][0] = {"tokens": long_toks}
        info, labels, starts, ends, top = preprocess(
            fix, max_length=6, word_count_threshold=2
        )
        ds = Dataset(info, labels, starts, ends, top)
        raw = ds.raw_sentences_for_image(500)
        assert raw is not None and len(raw) == 5
        assert raw[0] == " ".join(long_toks)  # untruncated, no UNK
        # truncated label decode would differ
        sents = decode_sequence(info["ix_to_word"], ds.captions_for_image(500))
        assert sents[0] != raw[0]
        # images without the field (legacy info JSON) return None
        del info["images"][0]["raw_sentences"]
        ds2 = Dataset(info, labels, starts, ends, top)
        assert ds2.raw_sentences_for_image(500) is None

    def test_ngram_doc_freq(self):
        ds = synthetic_dataset(seed=1)
        ids = ds.splits()["train"]
        df = compute_doc_freq(ds, ids)
        assert len(df) > 0
        # df counts images, not captions: df <= #images
        assert max(df.values()) <= len(ids)
        # every n-gram of image 0's first caption is present
        for gram in seq_ngrams(ds.captions_for_image(ids[0])[0]):
            assert gram in df

    def test_empty_caption_rejected(self):
        """The reference aborts on empty captions (prepro_labels.py:130
        assert); an all-zero label row would silently train on an
        immediate-EOS target (review r3)."""
        fix = self.karpathy_fixture()
        fix["images"][2]["sentences"][1] = {"tokens": ["  ", ""]}
        with pytest.raises(ValueError, match="empty caption"):
            preprocess(fix, max_length=6, word_count_threshold=2)

    def test_ngrams_full_row_gets_eos(self):
        """A caption that fills the whole label row has no 0 terminator;
        its EOS n-grams must still count (the reference always appends
        <eos> — review r3)."""
        from recurrent_fusion_network_tpu.data.prepro_ngrams import seq_ngrams

        grams = seq_ngrams(np.array([3, 4, 5, 6], dtype=np.int64), n_max=2)
        assert (6, 0) in grams and (0,) in grams

    def test_ngrams_karpathy_source_is_untruncated(self):
        """--karpathy_json counts df over the UNtruncated sent['tokens']
        (reference semantics); the label-matrix path loses n-grams past
        max_length (review r3)."""
        from recurrent_fusion_network_tpu.data.prepro_ngrams import (
            compute_doc_freq,
            compute_doc_freq_karpathy,
        )

        fix = self.karpathy_fixture()
        long_toks = ["a", "man", "dog", "park", "ball", "runs", "big",
                     "park", "ball"]
        fix["images"][0]["sentences"][0] = {"tokens": long_toks}
        info, labels, starts, ends, top = preprocess(
            fix, max_length=6, word_count_threshold=2
        )
        ds = Dataset(info, labels, starts, ends, top)
        w2i = {w: int(i) for i, w in info["ix_to_word"].items()}
        df_k, n = compute_doc_freq_karpathy(fix["images"], w2i)
        train_ids = ds.splits()["train"]
        assert n == len(train_ids)
        df_m = compute_doc_freq(ds, train_ids)
        # the tail bigram ('park','ball') at positions 7-8 only exists in
        # image 500's long caption — the truncated matrix (max_length 6)
        # cannot see it there; if no other caption carries it, the two
        # sources must disagree on that key
        tail = (w2i["park"], w2i["ball"])
        assert df_k.get(tail, 0) >= df_m.get(tail, 0)
        assert df_k != df_m  # truncation loses mass somewhere

    def test_ngrams_split_all(self, tmp_path):
        """--split all must work (the reference script's mode), not
        KeyError (review r3)."""
        import pickle as pkl

        from recurrent_fusion_network_tpu.data import prepro_ngrams
        from recurrent_fusion_network_tpu.data import prepro_labels

        fix = self.karpathy_fixture()
        (tmp_path / "k.json").write_text(json.dumps(fix))
        prepro_labels.main([
            "--input_json", str(tmp_path / "k.json"),
            "--output_json", str(tmp_path / "info.json"),
            "--output_labels", str(tmp_path / "lab.npz"),
            "--output_top_words", str(tmp_path / "top.pkl"),
            "--word_count_threshold", "2",
        ])
        prepro_ngrams.main([
            "--input_json", str(tmp_path / "info.json"),
            "--input_labels", str(tmp_path / "lab.npz"),
            "--output_pkl", str(tmp_path / "all.p"),
            "--split", "all",
        ])
        out = pkl.load(open(tmp_path / "all.p", "rb"))
        assert out["ref_len"] == pytest.approx(float(np.log(12)))
        # and the karpathy-exact CLI path round-trips
        prepro_ngrams.main([
            "--input_json", str(tmp_path / "info.json"),
            "--input_labels", str(tmp_path / "lab.npz"),
            "--output_pkl", str(tmp_path / "train.p"),
            "--karpathy_json", str(tmp_path / "k.json"),
        ])
        out2 = pkl.load(open(tmp_path / "train.p", "rb"))
        assert len(out2["document_frequency"]) > 0


class TestDirFeatureSource:
    def test_reference_layout_roundtrip(self, tmp_path):
        """Per-image {id}.npy / {id}.npz('feat') dirs — the reference's exact
        on-disk layout (dataloader.py:15-18) — load through the DataLoader."""
        from recurrent_fusion_network_tpu.config import Options
        from recurrent_fusion_network_tpu.data.dataset import DirFeatureSource
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_dataset

        ds = synthetic_dataset(seed=9)
        g = np.random.default_rng(0)
        dirs = {}
        for variant in ("original", "flip"):
            fc_dir = tmp_path / variant / "fc"
            att_dir = tmp_path / variant / "att"
            fc_dir.mkdir(parents=True)
            att_dir.mkdir(parents=True)
            for img in ds.info["images"]:
                np.save(fc_dir / f"{img['id']}.npy",
                        g.standard_normal(6).astype(np.float32))
                np.savez(att_dir / f"{img['id']}.npz",
                         feat=g.standard_normal((3, 4)).astype(np.float32))
            dirs[variant] = {"fc": str(fc_dir), "att": str(att_dir)}
        src = DirFeatureSource(dirs)
        fc, att = src.load(ds.info["images"][0]["id"], "original")
        assert fc.shape == (6,) and att.shape == (3, 4)

        feats = [{"fc_feat_size": 6, "att_feat_size": 4, "att_num": 3}]
        opt = Options(caption_model="show_tell", feature_type="dir_single",
                      feat_array_info=feats, batch_size=2, seq_per_img=2,
                      top_words_count=len(ds.top_words), use_flip=1)
        opt.vocab_size, opt.seq_length = ds.vocab_size, ds.seq_length
        loader = DataLoader(opt, ds, [src], prefetch=False)
        batch = loader.get_batch("train")
        assert batch["fc_feats"].shape == (4, 6)
        assert batch["att_feats"].shape == (4, 3, 4)


class TestOfficialSplit:
    def test_official_id_files(self, tmp_path):
        from recurrent_fusion_network_tpu.config import Options
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_dataset
        from recurrent_fusion_network_tpu.data.dataset import SyntheticFeatureSource

        ds = synthetic_dataset(seed=11)
        ids = [img["id"] for img in ds.info["images"]]
        files = {}
        for split, chunk in zip(("train", "val", "test"),
                                (ids[:30], ids[30:35], ids[35:])):
            p = tmp_path / f"{split}.txt"
            p.write_text("".join(f"{i}\n" for i in chunk))
            files[split] = str(p)
        feats = [{"fc_feat_size": 5, "att_feat_size": 4, "att_num": 3}]
        opt = Options(caption_model="show_tell", feature_type="syn",
                      feat_array_info=feats, batch_size=2, seq_per_img=2,
                      top_words_count=len(ds.top_words),
                      use_official_split=1,
                      official_train_id_file=files["train"],
                      official_val_id_file=files["val"],
                      official_test_id_file=files["test"])
        opt.vocab_size, opt.seq_length = ds.vocab_size, ds.seq_length
        src = SyntheticFeatureSource(5, 3, 4)
        loader = DataLoader(opt, ds, [src], prefetch=False)
        assert loader.split_image_id["train"] == ids[:30]
        assert loader.split_image_id["val"] == ids[30:35]
        batch = loader.get_batch("val")
        assert batch["infos"][0]["id"] in ids[30:35]


class TestPrefetcherFailure:
    def test_prefetch_error_sticky_not_deadlock(self):
        """After the prefetcher thread dies on an assembly error, EVERY
        subsequent get_batch raises instead of blocking on the dead queue
        (ADVICE r2: loader.py:316). Queued-good batches still drain first."""
        import pytest

        opt, loader = synthetic_setup(prefetch=True, seed=11)
        loader.get_batch("train")  # spin up the train prefetcher
        pre = loader._prefetchers["train"]
        boom = RuntimeError("disk on fire")

        def broken(split):
            raise boom

        loader._assemble_batch = broken
        # drain whatever good batches were already buffered (DEPTH=2 max),
        # then the error must surface — and KEEP surfacing
        raised = 0
        for _ in range(pre.DEPTH + 2):
            try:
                loader.get_batch("train")
            except RuntimeError:
                raised += 1
        assert raised >= 2, "error must re-deliver, not deadlock"
        with pytest.raises(RuntimeError, match="prefetcher"):
            loader.get_batch("train")
        loader.close()


class TestWriterValidation:
    def test_sharded_write_mismatches_are_real_errors(self, tmp_path):
        """ValueError, not strippable asserts: a store written under
        `python -O` with mismatched inputs must not serve corrupt rows."""
        from recurrent_fusion_network_tpu.data.sharded import ShardedFeatureSource

        fc = {"original": np.zeros((2, 3), np.float32)}
        with pytest.raises(ValueError, match="variant sets"):
            ShardedFeatureSource.write(
                str(tmp_path / "a"), [1, 2], fc,
                {"flip": np.zeros((2, 4, 5), np.float32)},
            )
        with pytest.raises(ValueError, match="row counts"):
            ShardedFeatureSource.write(
                str(tmp_path / "b"), [1, 2, 3], fc,
                {"original": np.zeros((2, 4, 5), np.float32)},
            )


class TestSourceDimsValidation:
    def test_store_geometry_checked_against_registry(self, tmp_path):
        """A discovered packed/sharded store whose dims contradict the
        registry entry (e.g. densenet extracted at att_size 14 where the
        registry declares 49) must be rejected at source resolution with a
        one-line message, not surface as an opaque shape error deep in
        model apply — or worse, train silently with wrong geometry."""
        from recurrent_fusion_network_tpu.data.build import _source_for
        from recurrent_fusion_network_tpu.feat_registry import EncoderInfo

        root = tmp_path / "enc" / "packed"
        PackedFeatureSource.write(
            str(root), [1],
            {"original": np.zeros((1, 8), np.float32)},
            {"original": np.zeros((1, 4, 6), np.float32)},
        )
        bad = EncoderInfo(name="enc", fc_feat_size=8, att_feat_size=6,
                          att_num=9, data_root=str(tmp_path))
        with pytest.raises(ValueError, match="registry declares"):
            _source_for(bad, str(tmp_path))
        ok = EncoderInfo(name="enc", fc_feat_size=8, att_feat_size=6,
                         att_num=4, data_root=str(tmp_path))
        src = _source_for(ok, str(tmp_path))
        assert src.load(1)[0].shape == (8,)

    def test_sharded_store_geometry_checked(self, tmp_path):
        from recurrent_fusion_network_tpu.data.build import _source_for
        from recurrent_fusion_network_tpu.data.sharded import ShardedFeatureSource
        from recurrent_fusion_network_tpu.feat_registry import EncoderInfo

        root = tmp_path / "enc" / "sharded"
        ShardedFeatureSource.write(
            str(root), [1, 2],
            {"original": np.zeros((2, 8), np.float32)},
            {"original": np.zeros((2, 4, 6), np.float32)},
        )
        bad = EncoderInfo(name="enc", fc_feat_size=8, att_feat_size=7,
                          att_num=4, data_root=str(tmp_path))
        with pytest.raises(ValueError, match="registry declares"):
            _source_for(bad, str(tmp_path))
