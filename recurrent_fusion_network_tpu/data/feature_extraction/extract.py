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
    PackedFeatureSource ({variant}_fc.npy / {variant}_att.npy + ids.json);
  * preemptible: a progress marker (progress.json, bound to the exact work
    list) is checkpointed at flush boundaries and on SIGTERM; re-running
    the same command resumes at the recorded row (--resume 0 to disable).

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

# native geometry per arch family (image_size, att_size): the input size the
# weights were trained for and the spatial grid it produces — matching the
# feat_registry dims the downstream model is built from (resnet 448 -> 14x14
# via adaptive pool, densenet161 224 -> 7x7, inception* 299 -> 8x8 fixed).
# Used when --image_size/--att_size are not given; explicit values are
# validated against the backbone's actual output grid before any IO.
ARCH_GEOMETRY = {
    "resnet": (448, 14),
    "densenet": (224, 7),
    "inception": (299, 8),
}


def default_geometry(arch: str):
    for prefix, geo in ARCH_GEOMETRY.items():
        if arch.startswith(prefix):
            return geo
    raise ValueError(f"no native geometry known for arch {arch}")


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
    p.add_argument("--image_size", type=int, default=None,
                   help="input resolution; default: the arch's native size "
                        "(resnet 448, densenet 224, inception 299)")
    p.add_argument("--att_size", type=int, default=None,
                   help="spatial grid side; default: the arch's native grid "
                        "(resnet 14, densenet 7, inception 8); validated "
                        "against the backbone's actual output before IO")
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
    p.add_argument("--resume", type=int, default=1,
                   help="continue an interrupted extraction from its "
                        "progress marker (SIGTERM checkpoints it; COCO-"
                        "scale extraction is hours per encoder); 0 = "
                        "always start fresh")
    args = p.parse_args(argv)

    native_imsz, native_att = default_geometry(args.arch)
    if args.image_size is None:
        args.image_size = native_imsz
    if args.att_size is None:
        args.att_size = native_att

    params, feats_fn, C_fc, C_att = build_backbone(
        args.arch, args.att_size, args.torch_weights
    )

    # validate the (image_size, att_size) pair against the backbone's actual
    # output grid BEFORE opening any arrays: inception grids are fixed by the
    # input size (backbones ignore att_size there), and a mismatched pair
    # would either crash on the first batch's reshape after a minutes-long
    # compile or silently write a geometry the feat_registry contradicts
    fc_s, att_s = jax.eval_shape(
        feats_fn, params,
        jax.ShapeDtypeStruct((1, args.image_size, args.image_size, 3),
                             jnp.float32),
    )
    npos = int(np.prod(att_s.shape[1:-1]))
    if npos != args.att_size ** 2 or att_s.shape[-1] != C_att:
        raise SystemExit(
            f"--arch {args.arch} at --image_size {args.image_size} produces "
            f"an att grid of {npos} positions x {att_s.shape[-1]} channels; "
            f"--att_size {args.att_size} wants {args.att_size ** 2}. Use the "
            f"native geometry (--image_size {native_imsz} --att_size "
            f"{native_att}) or a consistent override."
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

    # weights as an explicit jit arg: a closed-over tree is embedded in the
    # compile payload as constants (remote-compile backends cap the request
    # size — HTTP 413 at backbone scale) and blocks the compile cache from
    # reusing the graph across weight sets
    params = jax.device_put(params)

    @jax.jit
    def run(p, batch):
        return feats_fn(p, batch)

    out_dir = args.output_dir
    pack_dir = out_dir if args.output_format == "packed" else out_dir + ".packed_tmp"
    os.makedirs(pack_dir, exist_ok=True)
    S = args.att_size

    # ---------------------------------------------------------- resume state
    # a progress marker makes the hours-long COCO extraction preemptible:
    # SIGTERM (or a crash) loses at most one flush window, and re-invoking
    # the same command continues at the recorded row. The marker binds to
    # the exact work list (names hash + dims + variants) AND the backbone
    # weights (path + size + mtime): any mismatch starts fresh rather than
    # silently mixing incompatible rows — in particular a random-init dry
    # run must never satisfy (or extend) a marker once real weights appear
    # (run_coco.sh adds --torch_weights conditionally on file presence).
    import hashlib

    def weights_fingerprint(path):
        if not path:
            return None
        st = os.stat(path)
        return [os.path.abspath(path), st.st_size, st.st_mtime_ns]

    meta = {
        "n": N,
        "variants": list(variants),
        "arch": args.arch,
        "att_size": S,
        "image_size": args.image_size,
        "torch_weights": weights_fingerprint(args.torch_weights),
        "names_sha1": hashlib.sha1("\n".join(names).encode()).hexdigest(),
    }
    progress_path = os.path.join(pack_dir, "progress.json")
    done_rows = 0
    if args.resume and os.path.exists(progress_path):
        with open(progress_path) as f:
            prog = json.load(f)
        if all(prog.get(k) == v for k, v in meta.items()):
            done_rows = int(prog.get("done", 0))
            print(f"resuming extraction at row {done_rows}/{N}")
        else:
            print("progress marker does not match this invocation — "
                  "starting fresh")

    def write_progress(done):
        tmp = progress_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({**meta, "done": done}, f)
        os.replace(tmp, progress_path)

    # flag-setting SIGTERM guard shared with the training loops (second
    # signal steps aside, so an impatient supervisor's next one acts
    # immediately even mid-compile; handler skipped off the main thread)
    from ...training.preempt import PreemptGuard

    guard = PreemptGuard(enabled=True).install()

    # stream straight into the on-disk arrays: at COCO scale the att matrix
    # is ~200 GB per variant and must never be RAM-resident. IMAGE-major
    # order: each image decodes from disk ONCE and all its augmentation
    # variants derive from that decode (variant-major would redo the JPEG
    # decode V times — ~1.1M redundant decodes at COCO scale with all 10).
    if done_rows and not all(
        os.path.exists(os.path.join(pack_dir, f"{v}_{kind}.npy"))
        for v in variants for kind in ("fc", "att")
    ):
        print("progress marker without its arrays — starting fresh")
        done_rows = 0  # marker without arrays: start over
    fc_outs, att_outs = {}, {}
    for variant in variants:
        fc_path = os.path.join(pack_dir, f"{variant}_fc.npy")
        att_path = os.path.join(pack_dir, f"{variant}_att.npy")
        if done_rows:
            fc_outs[variant] = np.lib.format.open_memmap(fc_path, mode="r+")
            att_outs[variant] = np.lib.format.open_memmap(att_path, mode="r+")
            assert fc_outs[variant].shape == (N, C_fc)
            assert att_outs[variant].shape == (N, S * S, C_att)
        else:
            fc_outs[variant] = np.lib.format.open_memmap(
                fc_path, mode="w+", dtype=np.float32, shape=(N, C_fc),
            )
            att_outs[variant] = np.lib.format.open_memmap(
                att_path, mode="w+",
                dtype=np.float32, shape=(N, S * S, C_att),
            )

    def flush_all():
        for variant in variants:
            fc_outs[variant].flush()
            att_outs[variant].flush()

    # ids.json is the COMPLETION marker consumers key on (PackedFeatureSource
    # loads it unconditionally): while rows remain, a stale one from a prior
    # completed extraction must not survive — a fresh restart zero-truncates
    # the arrays, and a preemption before refilling them would otherwise
    # leave a directory that LOOKS complete while rows past the progress
    # marker are zeros (silently consumed by training downstream).
    ids_path = os.path.join(pack_dir, "ids.json")
    if done_rows < N and os.path.exists(ids_path):
        os.unlink(ids_path)

    preempted = False
    for start in range(done_rows, N, B):
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
            fc, att = run(params, var_imgs)
            fc_outs[variant][start : start + len(chunk)] = (
                np.asarray(fc)[: len(chunk)]
            )
            att_outs[variant][start : start + len(chunk)] = (
                np.asarray(att)[: len(chunk)].reshape(len(chunk), S * S, C_att)
            )
        # snapshot the flag ONCE per iteration so the flush decision, the
        # break, and the printed row all agree (a signal landing between
        # separate reads could break without writing the marker it reports)
        stop_now = guard.triggered
        if ((start - done_rows) // B) % 50 == 0 or stop_now:
            # flush BEFORE the marker: the marker must never claim rows the
            # data pages haven't reached disk for
            flush_all()
            write_progress(start + len(chunk))
            print(f"{start + len(chunk)}/{N} images x {len(variants)} variants")
        if stop_now and start + len(chunk) < N:
            # rows remain: checkpoint and leave. A signal landing on the
            # FINAL chunk is completion, not preemption — finalize normally
            # rather than forcing a whole re-invocation (backbone rebuild +
            # weight load) just to write ids.json over finished arrays.
            print(f"preempted — extraction checkpointed at row "
                  f"{start + len(chunk)}/{N}; re-run to resume")
            preempted = True
            break
    guard.close()
    flush_all()
    if preempted:
        return
    write_progress(N)
    del fc_outs, att_outs
    with open(ids_path, "w") as f:
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
