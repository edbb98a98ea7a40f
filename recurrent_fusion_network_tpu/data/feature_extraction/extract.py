"""Feature extraction CLI.

Equivalent of the reference's per-encoder extract_*_feats.py scripts
(data/feature_extraction/resnet/extract_resnet_feats.py:60-98), redesigned
TPU-first:

  * images resized to a fixed --image_size (default 448 -> an exact 14x14
    final-stage grid) and processed in BATCHES under one jitted program,
    instead of per-image full-resolution graphs;
  * all 10 augmentation variants are composed on the fly (augment.py) instead
    of pre-rendering 10 image trees to disk;
  * output is the packed memory-mapped layout consumed by
    PackedFeatureSource ({variant}_fc.npy / {variant}_att.npy + ids.json).

Weights: --torch_weights <path to a torchvision resnet*.pth state dict>;
without it the backbone is randomly initialized (pipeline smoke runs only).

  python -m recurrent_fusion_network_tpu.data.feature_extraction.extract \
      --images_dir val2014/ --output_dir data/features/resnet/packed \
      --arch resnet101 --variants original,flip --batch_size 16
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .augment import VARIANTS, make_variant
from .backbones import ARCHS, build_backbone


def load_image(path: str, size: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def image_id_from_name(name: str) -> int:
    """COCO_val2014_000000391895.jpg -> 391895; plain '123.jpg' -> 123."""
    stem = os.path.splitext(os.path.basename(name))[0]
    tail = stem.split("_")[-1]
    return int(tail)


def main(argv=None):
    # standalone CLI (own argparse, not config.parse_opt): enable the
    # persistent compile cache explicitly — the backbone conv graphs take
    # minutes (inception_v4: ~50 min cold on remote-compile hosts) and must
    # not be paid again on every extraction run
    from ...config import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--images_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--arch", default="resnet101", choices=list(ARCHS))
    p.add_argument("--torch_weights", default=None)
    p.add_argument("--image_size", type=int, default=448)
    p.add_argument("--att_size", type=int, default=14)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--variants", default="original",
                   help=f"comma list from {','.join(VARIANTS)} or 'all'")
    p.add_argument("--limit", type=int, default=-1)
    p.add_argument("--output_format", default="packed",
                   choices=("packed", "sharded"),
                   help="packed: one mmap array per variant (single-host); "
                        "sharded: fixed-size row shards + manifest "
                        "(many-host, data/sharded.py)")
    p.add_argument("--shard_size", type=int, default=4096)
    args = p.parse_args(argv)

    params, feats_fn, C_fc, C_att = build_backbone(
        args.arch, args.att_size, args.torch_weights
    )

    variants = VARIANTS if args.variants == "all" else tuple(args.variants.split(","))

    names = sorted(
        f for f in os.listdir(args.images_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if args.limit > 0:
        names = names[: args.limit]
    ids = [image_id_from_name(n) for n in names]
    N, B = len(names), args.batch_size

    @jax.jit
    def run(batch):
        return feats_fn(params, batch)

    out_dir = args.output_dir
    pack_dir = out_dir if args.output_format == "packed" else out_dir + ".packed_tmp"
    os.makedirs(pack_dir, exist_ok=True)
    S = args.att_size
    # stream straight into the on-disk arrays: at COCO scale the att matrix
    # is ~200 GB per variant and must never be RAM-resident. IMAGE-major
    # order: each image decodes from disk ONCE and all its augmentation
    # variants derive from that decode (variant-major would redo the JPEG
    # decode V times — ~1.1M redundant decodes at COCO scale with all 10).
    fc_outs, att_outs = {}, {}
    for variant in variants:
        fc_outs[variant] = np.lib.format.open_memmap(
            os.path.join(pack_dir, f"{variant}_fc.npy"), mode="w+",
            dtype=np.float32, shape=(N, C_fc),
        )
        att_outs[variant] = np.lib.format.open_memmap(
            os.path.join(pack_dir, f"{variant}_att.npy"), mode="w+",
            dtype=np.float32, shape=(N, S * S, C_att),
        )
    for start in range(0, N, B):
        chunk = names[start : start + B]
        imgs = jnp.stack(
            [jnp.asarray(load_image(os.path.join(args.images_dir, n),
                                    args.image_size))
             for n in chunk]
        )
        pad = B - len(chunk)
        if pad:
            imgs = jnp.concatenate([imgs, jnp.zeros((pad,) + imgs.shape[1:])], 0)
        for variant in variants:
            var_imgs = jnp.stack([make_variant(im, variant) for im in imgs])
            fc, att = run(var_imgs)
            fc_outs[variant][start : start + len(chunk)] = (
                np.asarray(fc)[: len(chunk)]
            )
            att_outs[variant][start : start + len(chunk)] = (
                np.asarray(att)[: len(chunk)].reshape(len(chunk), S * S, C_att)
            )
        if (start // B) % 50 == 0:
            print(f"{start + len(chunk)}/{N} images x {len(variants)} variants")
    for variant in variants:
        fc_outs[variant].flush()
        att_outs[variant].flush()
    del fc_outs, att_outs
    with open(os.path.join(pack_dir, "ids.json"), "w") as f:
        json.dump(ids, f)
    if args.output_format == "sharded":
        from ..sharded import pack_to_shards

        pack_to_shards(pack_dir, out_dir, shard_size=args.shard_size)
        import shutil

        shutil.rmtree(pack_dir)
    print(f"wrote {N} images x {len(variants)} variants to {out_dir} "
          f"({args.output_format})")


if __name__ == "__main__":
    main()
