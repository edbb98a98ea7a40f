"""Caption a folder of raw images end-to-end.

Implements the reference's --image_folder eval mode (eval.py flags at
opts.py:227-230): extract CNN features with the in-framework JAX backbone
(data/feature_extraction) and decode captions with a trained captioner, all
on-device — no precomputed feature files needed.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import numpy as np

from ..data.feature_extraction.backbones import build_backbone
from ..data.feature_extraction.extract import image_id_from_name, load_image
from ..data.vocab import decode_sequence
from ..decoding.api import model_sample


def eval_image_folder(
    model,
    params,
    vocab,
    image_folder: str,
    *,
    beam_size: int = 3,
    batch_size: int = 16,
    image_size: int = 448,
    backbone_arch: str = "resnet101",
    backbone_weights: Optional[str] = None,
    att_size: int = 14,
) -> List[dict]:
    """Returns [{'image_id', 'file', 'caption'}] for every image in the folder."""
    # one backbone feeds one encoder: a multi-encoder RecurrentFusionModel
    # must be refused HERE with a clear message (its encode asserts
    # len(fc_feats) == M deep inside jit tracing otherwise); an M==1
    # feat-array model works with the single stream wrapped in a list
    wrap = hasattr(model, "fc_feat_sizes")
    if wrap and len(model.fc_feat_sizes) > 1:
        raise ValueError(
            f"--image_folder extracts ONE backbone's features, but this "
            f"{type(model).__name__} expects {len(model.fc_feat_sizes)} "
            f"encoder streams — precompute per-encoder features and use "
            f"the standard eval path instead"
        )
    bb_params, feats_fn, _, _ = build_backbone(backbone_arch, att_size, backbone_weights)

    names = sorted(
        f for f in os.listdir(image_folder)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )

    # weights ride as explicit jit args (device-committed once): closed-over
    # trees become embedded constants — a ~GB compile payload that
    # remote-compile backends reject (HTTP 413) — and host trees would
    # re-upload per batch
    bb_params = jax.device_put(bb_params)
    params = jax.device_put(params)

    @jax.jit
    def extract(bp, batch):
        fc, att = feats_fn(bp, batch)
        return fc, att.reshape(att.shape[0], -1, att.shape[-1])

    @jax.jit
    def caption(p, fc, att):
        if wrap:  # M==1 feat-array model: one-element encoder lists
            fc, att = [fc], [att]
        return model_sample(model, p, fc, att, beam_size=beam_size).seq

    out = []
    B = batch_size
    for start in range(0, len(names), B):
        chunk = names[start : start + B]
        imgs = np.stack(
            [load_image(os.path.join(image_folder, n), image_size) for n in chunk]
        )
        pad = B - len(chunk)
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        fc, att = extract(bb_params, imgs)
        seq = np.asarray(caption(params, fc, att))[: len(chunk)]
        sents = decode_sequence(vocab, seq)
        for name, sent in zip(chunk, sents):
            try:
                image_id = image_id_from_name(name)
            except ValueError:
                image_id = name
            out.append({"image_id": image_id, "file": name, "caption": sent})
    return out
