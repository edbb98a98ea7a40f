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
import numpy as np

from ..data.vocab import decode_sequence
from ..decoding.ensemble import ensemble_sample, flip_combine
from ..metrics.coco_eval import language_eval
from .eval_split import batch_feats, cast_tree, dedupe_feats, eval_dtype


def _member_feats(data, n_members, diff_feat, batch_size, seq_per_img,
                  dtype=None):
    """Per-member (fc, att), deduped to one row per image."""
    fc, att = batch_feats(data, dtype)
    fc1, att1 = dedupe_feats(fc, att, batch_size, seq_per_img)
    if diff_feat:
        assert isinstance(fc1, list) and len(fc1) >= n_members, (
            "diff_feat ensemble needs a feat_array batch with one encoder "
            "per member"
        )
        return [(fc1[i], att1[i]) for i in range(n_members)]
    return [(fc1, att1) for _ in range(n_members)]


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
    decode_jit = jax.jit(
        lambda ps, feats: ensemble_sample(models, ps, feats, beam_size=beam_size)
    )
    decode = lambda feats: decode_jit(params_list, feats)

    loader.reset_iterator(split)
    vocab = loader.get_vocab()
    predictions = []

    def batches():
        n = 0
        while True:
            data = loader.get_batch(split, variant="original") \
                if flip_ensemble else loader.get_batch(split)
            n += loader.batch_size
            yield data
            if data["bounds"]["wrapped"]:
                return
            if val_images_use > 0 and n >= val_images_use:
                return

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
        data_flip = _reload_variant(loader, data, "flip")
        feats_f = _shard(_member_feats(data_flip, len(members), diff_feat,
                                       local_bs, loader.seq_per_img, dtype))
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

    limit = len(loader.split_image_id[split])
    if val_images_use > 0:
        limit = min(limit, val_images_use)
    predictions = predictions[:limit]

    lang_stats = None
    if language_eval_flag:
        if gts_lookup is None:
            ds = loader.dataset

            def gts_lookup(image_id):
                # same protocol as eval_split: prefer the raw annotation
                # sentences (coco-caption scores against the annotations
                # JSON); the label-matrix fallback is truncated/UNK-ed and
                # not comparable to the reference's absolute scores
                raw = ds.raw_sentences_for_image(image_id)
                if raw:
                    return raw
                if image_id not in ds.image_id_to_index:
                    return []
                return decode_sequence(vocab, ds.captions_for_image(image_id))

        lang_stats = language_eval(
            gts_lookup, predictions, f"ensemble_{opt.id}_{rank}", split,
            out_dir=getattr(opt, "eval_results_dir", "eval_results"),
        )
    return predictions, lang_stats


def _reload_variant(loader, data, variant):
    """Load the same images' features under another augmentation variant."""
    sources = loader.sources
    ids = [info["id"] for info in data["infos"]]
    spi = loader.seq_per_img
    fc_batch = [[] for _ in sources]
    att_batch = [[] for _ in sources]
    for image_id in ids:
        for m, src in enumerate(sources):
            fc, att = src.load(image_id, variant)
            if att.ndim == 3:
                att = att.reshape(-1, att.shape[-1])
            fc_batch[m].append(fc)
            att_batch[m].append(att)
    out = dict(data)
    fc_all = [np.repeat(np.stack(fb), spi, axis=0).astype(np.float32) for fb in fc_batch]
    att_all = [np.repeat(np.stack(ab), spi, axis=0).astype(np.float32) for ab in att_batch]
    if "fc_feats_array" in data:
        out["fc_feats_array"] = fc_all
        out["att_feats_array"] = att_all
    else:
        out["fc_feats"] = fc_all[0]
        out["att_feats"] = att_all[0]
    return out
