"""The 10 augmentation variants.

Equivalent of the reference's generate_flip_images.py (horizontal flip) and
generate_crop_images.py (tf.image.crop_and_resize with 90% corner boxes:
top_right [0.0,0.1,0.9,1.0], top_left [0.0,0.0,0.9,0.9],
bottom_right [0.1,0.1,1.0,1.0], bottom_left [0.1,0.0,1.0,0.9]), composed
on-the-fly as jnp ops instead of pre-rendering 10 image trees to disk.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ...feat_registry import VARIANTS  # single source for the 10 variants

# normalized (y1, x1, y2, x2) boxes, reference generate_crop_images.py:18-27
VARIANT_BOXES: Dict[str, tuple] = {
    "crop_tr": (0.0, 0.1, 0.9, 1.0),
    "crop_tl": (0.0, 0.0, 0.9, 0.9),
    "crop_br": (0.1, 0.1, 1.0, 1.0),
    "crop_bl": (0.1, 0.0, 1.0, 0.9),
}


def _sample_coords(lo, hi, extent, n):
    """tf.image.crop_and_resize sampling grid along one axis: n points
    corner-aligned on [lo*(extent-1), hi*(extent-1)] (the box corners map
    exactly onto output corners); a single point samples the box center."""
    if n > 1:
        return lo * (extent - 1) + jnp.arange(n, dtype=jnp.float32) * (
            (hi - lo) * (extent - 1) / (n - 1)
        )
    return jnp.full((1,), 0.5 * (lo + hi) * (extent - 1), jnp.float32)


def crop_and_resize(img, box):
    """img: (H, W, C) float; crop the normalized box and resize back to
    (H, W) with tf.image.crop_and_resize single-box bilinear semantics
    (generate_crop_images.py:13-50): sample on a corner-aligned fractional
    grid over [y1*(H-1), y2*(H-1)] x [x1*(W-1), x2*(W-1)] — NOT an
    integer-pixel slice followed by a half-pixel-centered resize, whose
    every sampled value differs sub-pixel-wise from the reference's
    pre-rendered crop variants."""
    H, W = img.shape[0], img.shape[1]
    y1, x1, y2, x2 = box
    ys = _sample_coords(y1, y2, H, H)
    xs = _sample_coords(x1, x2, W, W)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1i = jnp.clip(y0 + 1, 0, H - 1)
    x1i = jnp.clip(x0 + 1, 0, W - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1i] * wx
    bot = img[y1i][:, x0] * (1 - wx) + img[y1i][:, x1i] * wx
    return top * (1 - wy) + bot * wy


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
