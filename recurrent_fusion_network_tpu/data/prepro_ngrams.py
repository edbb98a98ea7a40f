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
    """All 1..n_max-grams of a 0-terminated id sequence (EOS included),
    as int tuples."""
    toks = [int(t) for t in trim_with_eos(ids)]
    out = set()
    for n in range(1, n_max + 1):
        for i in range(len(toks) - n + 1):
            out.add(tuple(toks[i : i + n]))
    return out


def compute_doc_freq(dataset: Dataset, split_ids):
    """df[ngram] = number of train images whose caption SET contains it
    (scripts/prepro_ngrams.py:66-77 semantics)."""
    df = defaultdict(float)
    for image_id in split_ids:
        caps = dataset.captions_for_image(image_id)
        grams = set()
        for cap in caps:
            grams |= seq_ngrams(cap)
        for g in grams:
            df[g] += 1.0
    return dict(df)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--input_labels", required=True)
    p.add_argument("--output_pkl", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--include_restval", type=int, default=1)
    args = p.parse_args(argv)

    ds = Dataset.from_files(args.input_json, args.input_labels)
    splits = ds.splits(train_only=not args.include_restval)
    ids = splits[args.split]
    df = compute_doc_freq(ds, ids)
    out = {"document_frequency": df, "ref_len": float(np.log(len(ids)))}
    with open(args.output_pkl, "wb") as f:
        pickle.dump(out, f)
    print(f"images={len(ids)} ngrams={len(df)} ref_len={out['ref_len']:.4f}")


if __name__ == "__main__":
    main()
