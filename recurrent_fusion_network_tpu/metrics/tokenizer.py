"""PTB-style caption tokenization.

The reference shells out to Stanford CoreNLP's PTBTokenizer and then strips a
fixed punctuation list and lowercases
(coco-caption/pycocoevalcap/tokenizer/ptbtokenizer.py:21-68). For captions —
short, already-ASCII sentences — the observable effect is: lowercase,
punctuation removed, whitespace-split. This module reproduces that effect in
pure Python (no Java subprocess).
"""

from __future__ import annotations

import re
from typing import Dict, List

# the PTBTokenizer strip list (ptbtokenizer.py:13-16)
PUNCTUATIONS = [
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
]

_SPLIT = re.compile(r"[\s]+")
_PUNCT_CHARS = re.compile(r"[\.\?\!,:;]+$|^[\.\?\!,:;]+")


def tokenize_sentence(s: str) -> List[str]:
    out = []
    for tok in _SPLIT.split(s.strip().lower()):
        if not tok:
            continue
        tok = _PUNCT_CHARS.sub("", tok)
        if tok and tok not in PUNCTUATIONS:
            out.append(tok)
    return out


def tokenize(captions: Dict, joined: bool = True) -> Dict:
    """Tokenize {key: [sentence or {'caption': sentence}, ...]} like the
    reference PTBTokenizer.tokenize — returns {key: [tokenized string, ...]}."""
    out = {}
    for k, sents in captions.items():
        rows = []
        for s in sents:
            if isinstance(s, dict):
                s = s["caption"]
            toks = tokenize_sentence(s)
            rows.append(" ".join(toks) if joined else toks)
        out[k] = rows
    return out
