"""Label preprocessing CLI.

Python-3 re-implementation of the reference's scripts/prepro_labels.py
(:39-172): Karpathy-split JSON -> vocabulary (count > threshold, else UNK),
1-indexed label matrix clipped at --max_length, 1-based label_start_ix /
label_end_ix pointers, cocotalk-style info JSON — plus the top-words pickle
the reference expects at --top_words_path (dataloader.py:122-123) but never
ships a builder for.

Labels are written as .npz by default (same keys as the reference h5:
'labels', 'label_start_ix', 'label_end_ix'); give --output_labels a .h5
extension for reference-identical h5 output.

Usage:
  python -m recurrent_fusion_network_tpu.data.prepro_labels \
      --input_json data/dataset_coco.json \
      --output_json data/cocotalk.json \
      --output_labels data/cocotalk_label.npz \
      --output_top_words data/vocab_train.pkl
"""

from __future__ import annotations

import argparse
import json
import pickle
from collections import Counter

import numpy as np

from .vocab import build_vocab, encode_caption, ix_to_word_map


def preprocess(
    karpathy: dict,
    max_length: int = 16,
    word_count_threshold: int = 5,
    top_words_count: int = 1000,
):
    """Returns (info_json_dict, labels, start_ix, end_ix, top_words)."""
    images = karpathy["images"]

    def tokens(sent):
        # the Karpathy JSON ships pre-tokenized captions
        return [w.lower() for w in sent["tokens"] if w.strip()]

    # tokenize each sentence ONCE (vocab pass, encode pass, and top-words
    # pass all reuse the cached lists — ~616k sentences at COCO scale);
    # cached positionally, not by mutating the caller's dicts
    toks_cache = [[tokens(s) for s in img["sentences"]] for img in images]
    all_caps = [t for per_img in toks_cache for t in per_img]
    vocab = build_vocab(all_caps, word_count_threshold)
    word_to_ix = {w: i + 1 for i, w in enumerate(vocab)}

    labels, starts, ends, out_images = [], [], [], []
    row = 0
    for img, img_toks in zip(images, toks_cache):
        split = img.get("split", "train")
        out_images.append(
            {
                "id": img.get("cocoid", img.get("imgid")),
                "split": split,
                "file_path": (img.get("filepath", "") + "/" + img["filename"]).lstrip("/"),
                # Raw (untruncated, un-UNKed) reference sentences, kept so
                # language_eval can score against the annotation text the way
                # the reference's coco-caption protocol does (its gts come
                # from the annotations JSON, not the label matrix).
                "raw_sentences": [
                    s.get("raw") or " ".join(s["tokens"]) for s in img["sentences"]
                ],
            }
        )
        starts.append(row + 1)
        assert len(img["sentences"]) > 0, "image with no captions"
        for toks in img_toks:
            enc = encode_caption(toks, word_to_ix, max_length)
            if len(enc) == 0:
                # the reference aborts on empty captions
                # (scripts/prepro_labels.py:130 assert label_length > 0);
                # an all-zero row would silently train on an immediate-EOS
                # target and pollute the n-gram doc-freqs
                raise ValueError(
                    f"empty caption for image "
                    f"{img.get('cocoid', img.get('imgid'))!r} — fix or drop "
                    f"the annotation"
                )
            rowv = np.zeros(max_length, dtype=np.int64)
            rowv[: len(enc)] = enc
            labels.append(rowv)
            row += 1
        ends.append(row)

    # top words by frequency over TRAIN captions only
    train_counts = Counter()
    for img, img_toks in zip(images, toks_cache):
        if img.get("split", "train") in ("train", "restval"):
            for toks in img_toks:
                train_counts.update(toks)
    top_words = [w for w, _ in train_counts.most_common(top_words_count)]

    info = {"ix_to_word": ix_to_word_map(vocab), "images": out_images}
    return info, np.stack(labels), np.array(starts), np.array(ends), top_words


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_json", required=True)
    p.add_argument("--output_json", required=True)
    p.add_argument("--output_labels", required=True)
    p.add_argument("--output_top_words", default=None)
    p.add_argument("--max_length", type=int, default=16)
    p.add_argument("--word_count_threshold", type=int, default=5)
    p.add_argument("--top_words_count", type=int, default=1000)
    args = p.parse_args(argv)

    with open(args.input_json) as f:
        karpathy = json.load(f)
    info, labels, starts, ends, top_words = preprocess(
        karpathy, args.max_length, args.word_count_threshold, args.top_words_count
    )

    with open(args.output_json, "w") as f:
        json.dump(info, f)
    if args.output_labels.endswith(".h5"):
        import h5py

        with h5py.File(args.output_labels, "w") as h5:
            h5.create_dataset("labels", data=labels, dtype="uint32")
            h5.create_dataset("label_start_ix", data=starts, dtype="uint32")
            h5.create_dataset("label_end_ix", data=ends, dtype="uint32")
    else:
        np.savez(
            args.output_labels,
            labels=labels,
            label_start_ix=starts,
            label_end_ix=ends,
        )
    if args.output_top_words:
        with open(args.output_top_words, "wb") as f:
            pickle.dump({"words": top_words}, f)
    print(
        f"vocab={len(info['ix_to_word'])} images={len(info['images'])} "
        f"captions={labels.shape[0]} top_words={len(top_words)}"
    )


if __name__ == "__main__":
    main()
