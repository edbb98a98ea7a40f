"""The 10 augmentation variants.

Equivalent of the reference's generate_flip_images.py (horizontal flip) and
generate_crop_images.py (tf.image.crop_and_resize with 90% corner boxes:
top_right [0.0,0.1,0.9,1.0], top_left [0.0,0.0,0.9,0.9],
bottom_right [0.1,0.1,1.0,1.0], bottom_left [0.1,0.0,1.0,0.9]), composed
on-the-fly as jnp ops instead of pre-rendering 10 image trees to disk.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...feat_registry import VARIANTS  # single source for the 10 variants

# normalized (y1, x1, y2, x2) boxes, reference generate_crop_images.py:18-27
VARIANT_BOXES: Dict[str, tuple] = {
    "crop_tr": (0.0, 0.1, 0.9, 1.0),
    "crop_tl": (0.0, 0.0, 0.9, 0.9),
    "crop_br": (0.1, 0.1, 1.0, 1.0),
    "crop_bl": (0.1, 0.0, 1.0, 0.9),
}


def crop_and_resize(img, box):
    """img: (H, W, C) float; crop the normalized box and resize back to
    (H, W) bilinearly (tf.image.crop_and_resize single-box semantics)."""
    H, W = img.shape[0], img.shape[1]
    y1, x1, y2, x2 = box
    r0, r1 = int(round(y1 * H)), int(round(y2 * H))
    c0, c1 = int(round(x1 * W)), int(round(x2 * W))
    crop = img[r0:r1, c0:c1]
    return jax.image.resize(crop, (H, W, img.shape[2]), method="bilinear")


def make_variant(img, variant: str):
    if variant == "original":
        return img
    flip = variant.startswith("flip")
    box_key = variant.replace("flip_", "") if variant != "flip" else None
    out = img[:, ::-1, :] if flip else img
    if box_key and box_key != "flip":
        out = crop_and_resize(out, VARIANT_BOXES[box_key])
    return out


def make_variants(img, variants=VARIANTS):
    """{variant: (H, W, C) image} for the requested variants."""
    return {v: make_variant(img, v) for v in variants}
