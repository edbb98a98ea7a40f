"""Ensemble evaluation driver.

Equivalent of the reference's eval_ensemble.py + the four ensemble paths in
eval_utils.py (:387 eval_ensemble beam, :729 eval_ensemble_greedy,
:1026/:1183 eval_ensemble_diff_feat_{greedy,beam_search}), unified into one
loop:

  * members: N (model, params) pairs — multi-seed checkpoints of the same
    architecture, or per-encoder ReviewNets ('diff_feat' mode);
  * per decode step the member logits are averaged (eval_utils.py:282-289);
  * optional flip ensembling: decode with original and flip features, keep
    the higher-log-prob sentence per image (eval_ensemble.py:162-187).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.vocab import decode_sequence
from ..decoding.ensemble import ensemble_sample, flip_combine
from ..metrics.coco_eval import language_eval
from .eval_split import (
    batch_feats,
    cast_tree,
    dedupe_feats,
    default_gts_lookup,
    eval_dtype,
    iter_eval_batches,
    trim_to_budget,
)


def _to_device(x):
    return [jnp.asarray(v) for v in x] if isinstance(x, list) else jnp.asarray(x)


def _member_splits(fc1, att1, n_members, diff_feat):
    if diff_feat:
        assert isinstance(fc1, list) and len(fc1) >= n_members, (
            "diff_feat ensemble needs a feat_array batch with one encoder "
            "per member"
        )
        return [(fc1[i], att1[i]) for i in range(n_members)]
    return [(fc1, att1) for _ in range(n_members)]


def _member_feats(data, n_members, diff_feat, batch_size, seq_per_img,
                  dtype=None):
    """Per-member (fc, att), deduped to one row per image.

    Dedupe runs on HOST numpy BEFORE the device conversion: the loader's
    batch carries seq_per_img repeated rows per image (the loss pass needs
    them; the ensemble has no loss pass), so converting first would
    transfer ~spi x the needed feature bytes per batch."""
    fc, att = batch_feats(data, dtype, as_numpy=True)
    fc1, att1 = dedupe_feats(fc, att, batch_size, seq_per_img)
    return _member_splits(_to_device(fc1), _to_device(att1),
                          n_members, diff_feat)


def eval_ensemble(
    members: Sequence[Tuple],
    loader,
    opt,
    *,
    split: str = "test",
    beam_size: Optional[int] = None,
    val_images_use: Optional[int] = None,
    diff_feat: bool = False,
    flip_ensemble: Optional[bool] = None,
    language_eval_flag: Optional[bool] = None,
    gts_lookup=None,
    rank: int = 0,
    verbose: bool = False,
    mesh=None,
):
    """Returns (predictions, lang_stats_or_None).

    mesh: optional single-process 'dp' mesh — member features shard their
    batch axis across it (same contract as eval_split's mesh)."""
    if mesh is not None and jax.process_count() > 1:
        mesh = None  # per-host local eval (see eval_split)
    # host-sharded loaders materialize only local rows per batch (see
    # eval_split): dedupe with the LOCAL image count
    local_bs = loader.batch_size // getattr(loader, "host_count", 1)
    beam_size = opt.beam_size if beam_size is None else beam_size
    val_images_use = opt.val_images_use if val_images_use is None else val_images_use
    if flip_ensemble is None:
        flip_ensemble = bool(getattr(opt, "eval_flip_ensemble", 0))
    if language_eval_flag is None:
        language_eval_flag = bool(opt.language_eval)

    models = [m for m, _ in members]
    params_list = [p for _, p in members]
    # --dtype bfloat16 halves member residency, same policy as eval_split
    # (score math stays f32 inside the engine). At flagship scale this is
    # what makes the 8-member ensemble fit one 16 GB chip: 8 x 1.76 GB f32
    # members leave no decode workspace, 8 x 0.88 GB bf16 do. The cast runs
    # on HOST numpy (ml_dtypes), so peak device memory never sees f32.
    dtype = eval_dtype(opt)
    if dtype is not None:
        params_list = [cast_tree(p, dtype) for p in params_list]
    # commit member params to device ONCE: host-side trees passed to a
    # jitted fn re-upload on every call — at flagship scale that is all N
    # members' full weights per dispatched batch (x2 under flip_ensemble),
    # with two batches in flight under the pipeline
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        params_list = jax.device_put(
            params_list, NamedSharding(mesh, PartitionSpec())
        )
    else:
        params_list = jax.device_put(params_list)
    decode_jit = jax.jit(
        lambda ps, feats: ensemble_sample(models, ps, feats, beam_size=beam_size)
    )
    decode = lambda feats: decode_jit(params_list, feats)

    loader.reset_iterator(split)
    vocab = loader.get_vocab()
    predictions = []
    batches = lambda: iter_eval_batches(
        loader, split, val_images_use,
        variant="original" if flip_ensemble else None,
    )

    def _shard(feats):
        if mesh is None:
            return feats
        from ..parallel.mesh import with_dp_sharding

        return with_dp_sharding(mesh, feats)

    def dispatch(data):
        """Queue the decode(s) for one batch; returns device futures."""
        feats = _shard(_member_feats(data, len(members), diff_feat,
                                     local_bs, loader.seq_per_img, dtype))
        out_a = decode(feats)
        if not flip_ensemble:
            return out_a, None
        # same images, flipped features (the iterator is not advanced:
        # the SAME batch's images reload under the flip variant)
        fc_f, att_f = _variant_feats(loader, data, "flip", dtype)
        feats_f = _shard(_member_splits(_to_device(fc_f), _to_device(att_f),
                                        len(members), diff_feat))
        return out_a, decode(feats_f)

    from ..decoding.serve import pipelined_map

    for data, (out_a, out_b) in pipelined_map(dispatch, batches(), depth=2):
        if flip_ensemble:
            seq, _ = flip_combine(out_a, out_b)
        else:
            seq = np.asarray(out_a.seq)
        sents = decode_sequence(vocab, seq)
        for k, sent in enumerate(sents):
            predictions.append({"image_id": data["infos"][k]["id"], "caption": sent})
        if verbose:
            b = data["bounds"]
            print(f"ensemble {split} ... {b['it_pos_now']}/{b['it_max']}")

    predictions = trim_to_budget(predictions, loader, split, val_images_use)

    lang_stats = None
    if language_eval_flag and predictions:  # see eval_split's empty guard
        if gts_lookup is None:
            gts_lookup = default_gts_lookup(loader)

        lang_stats = language_eval(
            gts_lookup, predictions, f"ensemble_{opt.id}_{rank}", split,
            out_dir=getattr(opt, "eval_results_dir", "eval_results"),
        )
    return predictions, lang_stats


def _variant_feats(loader, data, variant, dtype=None):
    """The same images' features under another augmentation variant —
    already one row per image (no seq_per_img repeat + re-dedupe: the
    decode only ever consumes the deduped rows)."""
    sources = loader.sources
    ids = [info["id"] for info in data["infos"]]
    fc_batch = [[] for _ in sources]
    att_batch = [[] for _ in sources]
    for image_id in ids:
        for m, src in enumerate(sources):
            fc, att = src.load(image_id, variant)
            if att.ndim == 3:
                att = att.reshape(-1, att.shape[-1])
            fc_batch[m].append(fc)
            att_batch[m].append(att)
    dt = dtype or np.float32
    fc_all = [np.stack(fb).astype(dt) for fb in fc_batch]
    att_all = [np.stack(ab).astype(dt) for ab in att_batch]
    if "fc_feats_array" in data:
        return fc_all, att_all
    return fc_all[0], att_all[0]
