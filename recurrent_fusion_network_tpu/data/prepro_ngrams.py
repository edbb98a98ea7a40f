"""CIDEr-D document-frequency precompute CLI.

Python-3 equivalent of the reference's scripts/prepro_ngrams.py (:66-120):
builds n-gram (n=1..4) document frequencies over the TRAIN split's encoded
captions, for use as the idf table of the RL reward scorer
(cider/pyciderevalcap/ciderD/ciderD_scorer.py:60-68).

The output pickle stores ngram tuples of INT token ids (not the reference's
index-string tuples) — the id space is identical, only the key encoding is
int-native for the vectorized scorer:

  {"document_frequency": {(id, ...): df, ...}, "ref_len": log(#train images)}

Usage:
  python -m recurrent_fusion_network_tpu.data.prepro_ngrams \
      --input_json data/cocotalk.json --input_labels data/cocotalk_label.npz \
      --output_pkl data/coco-train-idxs.p
"""

from __future__ import annotations

import argparse
import pickle
from collections import defaultdict

import numpy as np

from .dataset import Dataset


# single implementation shared with the reward scorer
from ..rewards.cider_d import trim_with_eos  # noqa: E402


def seq_ngrams(ids, n_max: int = 4):
    """All 1..n_max-grams of a 0-terminated id sequence, EOS included —
    a full-length row without a 0 terminator still gets its EOS n-grams
    appended (the reference counts sent['tokens'] + ['<eos>'] always,
    scripts/prepro_ngrams.py:96)."""
    toks = [int(t) for t in trim_with_eos(ids)]
    if not toks or toks[-1] != 0:
        toks.append(0)
    out = set()
    for n in range(1, n_max + 1):
        for i in range(len(toks) - n + 1):
            out.add(tuple(toks[i : i + n]))
    return out


def compute_doc_freq(dataset: Dataset, split_ids):
    """df[ngram] = number of train images whose caption SET contains it
    (scripts/prepro_ngrams.py:66-77 semantics).

    Source caveat: counts from the label MATRIX, whose captions are
    truncated at max_length — n-grams past the cut are lost relative to
    the reference's untruncated sent['tokens'] source. Pass the original
    Karpathy JSON to the CLI (--karpathy_json) for reference-exact df;
    this path remains for callers that only have the label artifacts."""
    df = defaultdict(float)
    for image_id in split_ids:
        caps = dataset.captions_for_image(image_id)
        grams = set()
        for cap in caps:
            grams |= seq_ngrams(cap)
        for g in grams:
            df[g] += 1.0
    return dict(df)


def compute_doc_freq_karpathy(images, word_to_ix, split: str = "train",
                              include_restval: bool = True, n_max: int = 4):
    """Reference-EXACT df source: the UNtruncated sent['tokens'] + <eos>,
    OOV mapped to UNK (scripts/prepro_ngrams.py:81-106). Returns
    (df, n_images); ref_len = log(n_images)."""
    unk = word_to_ix.get("UNK")
    df = defaultdict(float)
    n_img = 0
    for img in images:
        s = img.get("split", "train")
        if not (
            s == split
            or (split == "train" and include_restval and s == "restval")
            or split == "all"
        ):
            continue
        n_img += 1
        grams = set()
        for sent in img["sentences"]:
            toks = [w.lower() for w in sent["tokens"] if w.strip()]
            ids = [int(word_to_ix.get(w, unk)) for w in toks] + [0]
            for n in range(1, n_max + 1):
                for i in range(len(ids) - n + 1):
                    grams.add(tuple(ids[i : i + n]))
        for g in grams:
            df[g] += 1.0
    return dict(df), n_img


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--input_labels", required=True)
    p.add_argument("--output_pkl", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--include_restval", type=int, default=1)
    p.add_argument("--karpathy_json", default=None,
                   help="original Karpathy dataset JSON: counts df over the "
                        "UNtruncated sent['tokens'] exactly like the "
                        "reference script (the label matrix is truncated "
                        "at max_length)")
    args = p.parse_args(argv)

    ds = Dataset.from_files(args.input_json, args.input_labels)
    if args.karpathy_json:
        import json

        with open(args.karpathy_json) as f:
            images = json.load(f)["images"]
        word_to_ix = {w: int(i) for i, w in ds.ix_to_word.items()}
        df, n = compute_doc_freq_karpathy(
            images, word_to_ix, split=args.split,
            include_restval=bool(args.include_restval),
        )
    else:
        splits = ds.splits(train_only=not args.include_restval)
        if args.split == "all":
            ids = [i for s in ("train", "val", "test") for i in splits[s]]
        else:
            ids = splits[args.split]
        df, n = compute_doc_freq(ds, ids), len(ids)
    out = {"document_frequency": df, "ref_len": float(np.log(n))}
    with open(args.output_pkl, "wb") as f:
        pickle.dump(out, f)
    print(f"images={n} ngrams={len(df)} ref_len={out['ref_len']:.4f}")


if __name__ == "__main__":
    main()
