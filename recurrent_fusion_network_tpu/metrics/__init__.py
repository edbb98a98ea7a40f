"""Caption metrics (L8), pure Python/NumPy.

Replaces the reference's vendored coco-caption stack (SURVEY.md §2.2): the
Java subprocesses (Stanford tokenizer, METEOR jar, SPICE jar) are replaced by
a rule-based tokenizer and optional plug-in hooks; BLEU / ROUGE-L / CIDEr are
clean-room implementations of the published algorithms.

  tokenizer.py — PTB-style lowercase+punctuation-strip tokenization
  bleu.py      — corpus BLEU-1..4, 'closest' reference-length brevity penalty
  rouge.py     — ROUGE-L (LCS F-measure, beta=1.2)
  cider.py     — CIDEr / CIDEr-D (tf-idf n-gram cosine, corpus or fixed idf)
  coco_eval.py — COCOEvalCap-style harness producing the metric dict
"""

from .coco_eval import evaluate_captions, language_eval  # noqa: F401
