"""Encoder feature registry.

TPU-native equivalent of the reference's ``feat_array.py`` (reference:
feat_array.py:6-244): a static registry describing, per CNN encoder, the
fc-feature width, the spatial (attention) feature width, the number of
spatial positions, and the on-disk location of each of the 10 augmentation
variants (original / flip / 4 crops / 4 flip-crops).

Unlike the reference's literal nested dicts of hard-coded absolute paths, the
registry here derives variant paths from a single ``data_root`` template so it
works on any machine, while keeping the exact same variant names and the exact
same five encoders with the same dimensions:

  resnet               fc 2048  att 2048 x 196
  inception_v4         fc 1536  att 1536 x  64
  inception_v3         fc 2048  att 1280 x  64
  densenet             fc 2208  att 2208 x  49
  inception_resnet_v2  fc 1536  att 1536 x  64

(reference: feat_array.py:6,53,100,147,194 and list assembly at :240-244.)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Mapping

# Variant names, identical to the reference dataloader's aug list
# (reference: dataloader.py:73-74).
VARIANTS = (
    "original",
    "flip",
    "crop_tr",
    "crop_tl",
    "crop_bl",
    "crop_br",
    "flip_crop_tr",
    "flip_crop_tl",
    "flip_crop_bl",
    "flip_crop_br",
)


@dataclasses.dataclass(frozen=True)
class EncoderInfo(Mapping):
    """Static description of one CNN encoder's precomputed features.

    Behaves as a read-only mapping so call sites can use the reference's
    ``info['fc_feat_size']`` / ``info['original']['fc']`` access style.
    """

    name: str
    fc_feat_size: int
    att_feat_size: int
    att_num: int
    data_root: str = "data/features"

    def variant_dirs(self, variant: str) -> Dict[str, str]:
        if variant not in VARIANTS:
            raise KeyError(f"unknown variant {variant!r}; expected one of {VARIANTS}")
        base = os.path.join(self.data_root, self.name, variant)
        return {"fc": os.path.join(base, "fc"), "att": os.path.join(base, "att")}

    # Mapping protocol: scalar keys + the 10 variant keys.
    _SCALAR_KEYS = ("name", "fc_feat_size", "att_feat_size", "att_num")

    def __getitem__(self, key):
        if key in self._SCALAR_KEYS:
            return getattr(self, key)
        return self.variant_dirs(key)

    def __iter__(self):
        yield from self._SCALAR_KEYS
        yield from VARIANTS

    def __len__(self):
        return len(self._SCALAR_KEYS) + len(VARIANTS)


def _make(name: str, fc: int, att: int, num: int, data_root: str) -> EncoderInfo:
    return EncoderInfo(
        name=name, fc_feat_size=fc, att_feat_size=att, att_num=num, data_root=data_root
    )


def resnet_info(data_root: str = "data/features") -> EncoderInfo:
    return _make("resnet", 2048, 2048, 196, data_root)


def inception_v4_info(data_root: str = "data/features") -> EncoderInfo:
    return _make("inception_v4", 1536, 1536, 64, data_root)


def inception_v3_info(data_root: str = "data/features") -> EncoderInfo:
    return _make("inception_v3", 2048, 1280, 64, data_root)


def densenet_info(data_root: str = "data/features") -> EncoderInfo:
    return _make("densenet", 2208, 2208, 49, data_root)


def inception_resnet_v2_info(data_root: str = "data/features") -> EncoderInfo:
    return _make("inception_resnet_v2", 1536, 1536, 64, data_root)


_BUILDERS = {
    "resnet": resnet_info,
    "inception_v4": inception_v4_info,
    "inception_v3": inception_v3_info,
    "densenet": densenet_info,
    "inception_resnet_v2": inception_resnet_v2_info,
}


def encoder_info(name: str, data_root: str = "data/features") -> EncoderInfo:
    """Look up one encoder by name."""
    if name not in _BUILDERS:
        raise KeyError(f"feature_type not supported: {name}")
    return _BUILDERS[name](data_root)


def feat_array_info(data_root: str = "data/features") -> List[EncoderInfo]:
    """The 5-encoder fusion array, in the reference's order
    (reference: feat_array.py:240-244)."""
    return [
        resnet_info(data_root),
        inception_v4_info(data_root),
        inception_v3_info(data_root),
        densenet_info(data_root),
        inception_resnet_v2_info(data_root),
    ]
