"""Caption metrics (L8), pure Python/NumPy.

Replaces the reference's vendored coco-caption stack (SURVEY.md §2.2): the
Java subprocesses (Stanford tokenizer, METEOR jar, SPICE jar) are replaced by
a rule-based tokenizer and optional plug-in hooks; BLEU / ROUGE-L / CIDEr are
clean-room implementations of the published algorithms.

  tokenizer.py — PTB-style lowercase+punctuation-strip tokenization
  bleu.py      — corpus BLEU-1..4, 'closest' reference-length brevity penalty
  rouge.py     — ROUGE-L (LCS F-measure, beta=1.2)
  cider.py     — CIDEr / CIDEr-D (tf-idf n-gram cosine, corpus or fixed idf)
  meteor.py    — approximate Java-free METEOR (exact+stem stages)
  spice.py     — SPICE adapters for an external jar/service (exact reference
                 I/O contracts; the Java tooling itself is user-supplied)
  coco_eval.py — COCOEvalCap-style harness producing the metric dict
"""

from .coco_eval import evaluate_captions, language_eval  # noqa: F401
from .spice import (  # noqa: F401
    SpiceHTTPScorer,
    SpiceJavaScorer,
    spice_fn_from_scorer,
)
