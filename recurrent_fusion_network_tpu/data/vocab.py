"""Vocabulary construction and sequence decoding.

Mirrors the reference's vocab semantics: scripts/prepro_labels.py:39-120
(count threshold -> UNK, 1-indexed vocabulary, token 0 = BOS/EOS/pad) and
misc/utils.py:19-33 (decode_sequence stops at the first 0).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Sequence


def build_vocab(
    captions: Iterable[Sequence[str]], count_threshold: int = 5
) -> List[str]:
    """Words appearing more than `count_threshold` times, plus 'UNK'.

    Returns the vocabulary as a list; index i corresponds to token id i+1
    (id 0 is reserved for BOS/EOS/pad).
    """
    counts = Counter()
    for cap in captions:
        counts.update(cap)
    vocab = [w for w, n in counts.items() if n > count_threshold]
    bad_count = sum(n for w, n in counts.items() if n <= count_threshold)
    if bad_count > 0 or not vocab:
        vocab.append("UNK")
    # deterministic order: by descending count then lexical
    vocab.sort(key=lambda w: (-counts[w], w))
    return vocab


def encode_caption(
    cap: Sequence[str], word_to_ix: Dict[str, int], max_length: int
) -> List[int]:
    """Token ids (1-indexed), clipped to max_length, UNK for OOV."""
    unk = word_to_ix.get("UNK")
    out = []
    for w in cap[:max_length]:
        out.append(word_to_ix.get(w, unk))
    return out


def ix_to_word_map(vocab: Sequence[str]) -> Dict[str, str]:
    """The cocotalk.json 'ix_to_word' table: string keys, 1-indexed
    (scripts/prepro_labels.py builds the same shape)."""
    return {str(i + 1): w for i, w in enumerate(vocab)}


def decode_sequence(ix_to_word: Dict[str, str], seq) -> List[str]:
    """Token-id matrix (N, D) -> list of sentences; stops at the first 0
    (misc/utils.py:19-33)."""
    import numpy as np

    seq = np.asarray(seq)
    out = []
    for row in seq:
        words = []
        for ix in row:
            if int(ix) > 0:
                words.append(ix_to_word[str(int(ix))])
            else:
                break
        out.append(" ".join(words))
    return out
