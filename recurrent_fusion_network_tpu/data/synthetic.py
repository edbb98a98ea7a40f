"""Synthetic COCO-like fixture.

Replaces the reference's requirement for real COCO features during framework
development and testing (SURVEY.md §4): a tiny deterministic dataset with
per-image caption sets, top-word targets, and one SyntheticFeatureSource per
encoder — enough to exercise every training/eval path end-to-end.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..config import Options
from .dataset import Dataset, SyntheticFeatureSource
from .loader import DataLoader

WORDS = (
    "a the man woman dog cat ball park street red blue green small large "
    "sitting standing running holding wearing riding table chair tree sky "
    "grass water food plate bike car sign window door hat shirt".split()
)


def synthetic_dataset(
    n_train: int = 24,
    n_val: int = 8,
    n_test: int = 8,
    seq_length: int = 8,
    caps_per_image: int = 5,
    vocab_words: Optional[List[str]] = None,
    top_words_count: int = 12,
    seed: int = 0,
) -> Dataset:
    g = np.random.default_rng(seed)
    vocab = list(vocab_words or WORDS)
    V = len(vocab)
    ix_to_word = {str(i + 1): w for i, w in enumerate(vocab)}

    n = n_train + n_val + n_test
    images, labels, starts, ends = [], [], [], []
    row = 0
    for i in range(n):
        split = "train" if i < n_train else ("val" if i < n_train + n_val else "test")
        image_id = 1000 + i
        images.append({"id": image_id, "split": split, "file_path": f"img/{image_id}.jpg"})
        starts.append(row + 1)  # 1-based like the reference
        for _ in range(caps_per_image):
            ln = int(g.integers(3, seq_length + 1))
            cap = np.zeros(seq_length, dtype=np.int64)
            cap[:ln] = g.integers(1, V + 1, ln)
            labels.append(cap)
            row += 1
        ends.append(row)

    info = {"ix_to_word": ix_to_word, "images": images}
    top_words = vocab[:top_words_count]
    return Dataset(info, np.stack(labels), np.array(starts), np.array(ends), top_words)


def synthetic_setup(
    caption_model: str = "recurrent_fusion_model",
    num_encoders: int = 3,
    fc_dims: Tuple[int, ...] = (16, 12, 14),
    att_dims: Tuple[int, ...] = (10, 8, 12),
    att_nums: Tuple[int, ...] = (6, 4, 5),
    batch_size: int = 4,
    seq_per_img: int = 5,
    prefetch: bool = False,
    seed: int = 0,
    **opt_overrides,
):
    """Build (opt, model-ready loader) for smoke runs and tests."""
    ds = synthetic_dataset(seed=seed)
    feats = [
        {"fc_feat_size": fc_dims[i], "att_feat_size": att_dims[i], "att_num": att_nums[i]}
        for i in range(num_encoders)
    ]
    if caption_model != "recurrent_fusion_model":
        feats = feats[:1]
    opt = Options(
        caption_model=caption_model,
        feature_type="feat_array" if caption_model == "recurrent_fusion_model" else "synthetic_single",
        feat_array_info=feats,
        batch_size=batch_size,
        seq_per_img=seq_per_img,
        top_words_count=len(ds.top_words),
        rnn_size=opt_overrides.pop("rnn_size", 16),
        input_encoding_size=opt_overrides.pop("input_encoding_size", 16),
        att_hid_size=opt_overrides.pop("att_hid_size", 16),
        num_review_steps=opt_overrides.pop("num_review_steps", 2),
        num_review_steps_0=opt_overrides.pop("num_review_steps_0", 2),
        seed=seed,
        **opt_overrides,
    )
    opt.vocab_size = ds.vocab_size
    opt.seq_length = ds.seq_length
    sources = [
        SyntheticFeatureSource(f["fc_feat_size"], f["att_num"], f["att_feat_size"], seed=seed + i)
        for i, f in enumerate(feats)
    ]
    loader = DataLoader(opt, ds, sources, prefetch=prefetch)
    return opt, loader
