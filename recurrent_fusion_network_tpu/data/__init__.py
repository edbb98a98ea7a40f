"""Data layer: offline preprocessing (L0) + training-time loader (L2).

  vocab.py          — vocabulary build + sequence decode helpers
  dataset.py        — Dataset bundle (info/labels/top-words) + feature sources
  loader.py         — DataLoader with the reference's get_batch contract
  synthetic.py      — synthetic COCO-like fixture for tests and smoke runs
  prepro_labels.py  — CLI: Karpathy JSON -> cocotalk.json + labels (npz/h5)
  prepro_ngrams.py  — CLI: CIDEr-D document frequencies for RL rewards
"""

from .dataset import Dataset, DirFeatureSource, PackedFeatureSource, SyntheticFeatureSource  # noqa: F401
from .loader import DataLoader  # noqa: F401
from .vocab import decode_sequence  # noqa: F401
