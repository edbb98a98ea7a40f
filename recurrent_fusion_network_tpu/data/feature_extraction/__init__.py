"""Offline CNN feature extraction (L0, SURVEY.md §2.3).

TPU-native replacement for the reference's per-encoder extractor trees
(torchvision ResNet/DenseNet + ~26k LoC of vendored TF-slim Inception): a
pure-JAX ResNet backbone running batched on TPU, the 10-variant augmentation
pipeline (flip / 4 corner crops / flip-crops) as jnp image ops, and a packed
feature writer feeding PackedFeatureSource directly.

Pretrained weights load from a torchvision-format state dict via
``resnet_jax.load_torch_state_dict`` (the sandbox has no network access, so
no weights ship here).
"""

from .augment import VARIANT_BOXES, make_variants  # noqa: F401
from .resnet_jax import ResNetConfig, resnet_features, resnet_init  # noqa: F401
