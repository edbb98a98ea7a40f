"""Validation / test evaluation harness.

Equivalent of the reference's eval_utils.eval_split (eval_utils.py:66-265):
per-batch XE loss, greedy/beam sampling on features deduped to one row per
image, sentence decoding, optional language metrics, prediction trimming to
the evaluated image budget.

TPU-first: the loss and sample closures are jitted once and reused across
batches (fixed shapes from the loader), beam search runs batched instead of
per image, and batches are evaluated through a small in-flight window
(decoding/serve.pipelined_map) so the next batch's dispatch overlaps the
current batch's device compute and host readback (~28 ms fixed dispatch cost
on tunneled hosts, PERF_NOTES.md §1).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from ..data.vocab import decode_sequence
from ..decoding.api import model_sample
from ..metrics.coco_eval import language_eval
from .criterion import make_criterion


def batch_feats(data, dtype=None, *, as_numpy=False):
    """Batch feature arrays; as_numpy keeps them HOST-side (multi-host
    callers hand local rows straight to the global-array constructor — a
    device conversion first would round-trip device->host->device)."""
    lib = np if as_numpy else jnp
    conv = (lambda x: lib.asarray(x, dtype)) if dtype else lib.asarray
    if "fc_feats_array" in data:
        return (
            [conv(x) for x in data["fc_feats_array"]],
            [conv(x) for x in data["att_feats_array"]],
        )
    return conv(data["fc_feats"]), conv(data["att_feats"])


def cast_tree(tree, dtype):
    """Cast every float leaf of a pytree (bf16 inference casting).

    The dtype check reads the leaf's own .dtype attribute — jnp.asarray
    here would device-put every HOST leaf just to inspect it, defeating
    the cast-before-transfer HBM discipline of callers that hold f32
    numpy params (eval_ensemble member loading)."""

    def cast(x):
        d = getattr(x, "dtype", None)
        return x.astype(dtype) if d is not None and jnp.issubdtype(d, jnp.floating) else x

    return jax.tree_util.tree_map(cast, tree)


def eval_dtype(opt):
    """jnp dtype for eval/decode from opt.dtype ('float32' | 'bfloat16');
    score math stays f32 regardless (log-softmax boundaries cast up)."""
    return jnp.bfloat16 if getattr(opt, "dtype", "float32") == "bfloat16" else None


def dedupe_feats(fc, att, batch_size, seq_per_img):
    rows = np.arange(batch_size) * seq_per_img
    if isinstance(fc, list):
        return [f[rows] for f in fc], [a[rows] for a in att]
    return fc[rows], att[rows]


# jitted-closure caches: jax.jit caches per function OBJECT, so rebuilding
# the closures every eval_split call would recompile the full forward and
# decode programs at every periodic eval (code-review finding). Keyed by the
# hashable frozen model dataclass + the criterion/decoding knobs.
_LOSS_FN_CACHE = {}
def iter_eval_batches(loader, split, val_images_use, *, variant=None):
    """Eval batch stream shared by eval_split and eval_ensemble: stops at
    the epoch wrap or once val_images_use images were produced (batch_size
    counts IMAGES; each contributes seq_per_img label rows)."""
    n = 0
    while True:
        data = (loader.get_batch(split, variant=variant) if variant
                else loader.get_batch(split))
        n += loader.batch_size
        yield data
        if data["bounds"]["wrapped"]:
            return
        if val_images_use > 0 and n >= val_images_use:
            return


def trim_to_budget(predictions, loader, split, val_images_use):
    """Trim predictions to the GLOBAL image budget and drop wrap duplicates.

    predictions are this host's LOCAL rows, appended batch-major. On a
    host-sharded loader each global batch's images are laid out
    (host0 block, host1 block, ...), so a local row's GLOBAL position is
    batch*global_images + host_index*local_images + k. The previous
    predictions[:limit] compared the LOCAL list against the GLOBAL limit,
    so multi-host evals silently kept every local row — the scored image
    set depended on the topology (non-comparable best-checkpoint gating)
    and epoch-wrap duplicates survived on hosts past the cut.
    """
    limit = len(loader.split_image_id[split])
    if val_images_use > 0:
        limit = min(limit, val_images_use)
    hc = getattr(loader, "host_count", 1)
    if hc <= 1:
        return predictions[:limit]
    n_img_g = loader.batch_size  # images per GLOBAL batch
    n_l = n_img_g // hc
    base = loader.host_index * n_l
    return [
        p for pos, p in enumerate(predictions)
        if (pos // n_l) * n_img_g + base + (pos % n_l) < limit
    ]


def default_gts_lookup(loader):
    """image_id -> reference sentences, shared by both eval paths.

    Prefer the raw annotation sentences (reference protocol: coco-caption
    scores against the annotations JSON). Fall back to decoding the label
    matrix only when the info JSON predates raw_sentences — that fallback
    is seq_length-truncated and UNK-substituted, so absolute scores are
    not comparable to the reference's, though best-checkpoint gating
    still works."""
    ds = loader.dataset
    vocab = loader.get_vocab()

    def gts_lookup(image_id):
        raw = ds.raw_sentences_for_image(image_id)
        if raw:
            return raw
        if image_id not in ds.image_id_to_index:
            return []
        return decode_sequence(vocab, ds.captions_for_image(image_id))

    return gts_lookup


_SAMPLE_FN_CACHE = {}


def _cached_loss_fn(model, opt):
    key = (model, opt.caption_model, bool(opt.use_label_smoothing),
           opt.label_smoothing_epsilon, opt.reason_weight, opt.seq_length)
    if key not in _LOSS_FN_CACHE:
        crit = make_criterion(opt)

        @jax.jit
        def loss_fn(params, fc, att, labels, masks, top_words):
            lps, reason = model.forward(params, fc, att, labels)
            return crit(lps, labels, masks, reason, top_words)

        _LOSS_FN_CACHE[key] = loss_fn
    return _LOSS_FN_CACHE[key]


def _cached_sample_fn(model, beam_size, sample_max):
    key = (model, beam_size, bool(sample_max))
    if key not in _SAMPLE_FN_CACHE:
        # rng is an explicit (traced) arg: multinomial eval must draw fresh
        # noise per batch — without it, sample() falls back to a fixed
        # PRNGKey(0) and every batch of every run reuses identical gumbels
        _SAMPLE_FN_CACHE[key] = jax.jit(
            lambda params, fc, att, rng: model_sample(
                model, params, fc, att,
                beam_size=beam_size, sample_max=sample_max, rng=rng,
            )
        )
    return _SAMPLE_FN_CACHE[key]


def eval_split(model, params, loader, opt, *, split="val", val_images_use=None,
               beam_size=None, language_eval_flag=None, sample_max=True,
               gts_lookup=None, rank=0, verbose=False, mesh=None):
    """Returns (mean_loss, predictions, lang_stats_or_None).

    mesh: optional 'dp' mesh — eval batches shard their leading axis across
    it (params are replicated by the caller), so periodic eval inside a
    DP training run uses the whole slice instead of idling all but one chip.
    Requires batch_size (and the deduped image count) divisible by the mesh
    size. Single-process meshes only: on a multi-host mesh each host keeps
    evaluating its local rows unsharded (decode outputs must be host-
    addressable for sentence decoding)."""
    if mesh is not None and jax.process_count() > 1:
        mesh = None  # per-host local eval (see docstring)
    # on a host-sharded loader each batch materializes only this host's
    # contiguous block; dedupe and infos indexing must use the LOCAL count
    local_bs = loader.batch_size // getattr(loader, "host_count", 1)
    val_images_use = opt.val_images_use if val_images_use is None else val_images_use
    beam_size = opt.beam_size if beam_size is None else beam_size
    if language_eval_flag is None:
        language_eval_flag = bool(opt.language_eval)
    dtype = eval_dtype(opt)
    if dtype is not None:
        params = cast_tree(params, dtype)
    loss_fn = _cached_loss_fn(model, opt)
    sample_fn = _cached_sample_fn(model, beam_size, sample_max)

    loader.reset_iterator(split)
    loss_sum, loss_evals = 0.0, 0
    predictions = []
    vocab = loader.get_vocab()
    batches = lambda: iter_eval_batches(loader, split, val_images_use)
    # per-batch sampling noise (multinomial eval); greedy/beam ignore it
    sample_rng = jax.random.PRNGKey(getattr(opt, "seed", 0) or 0)
    batch_ix = {"n": -1}

    def dispatch(data):
        """Queue loss + decode for one batch; returns device futures."""
        fc, att = batch_feats(data, dtype)
        labels = jnp.asarray(data["labels"])
        masks = jnp.asarray(data["masks"])
        top_words = jnp.asarray(data["top_words"])
        fc1, att1 = dedupe_feats(fc, att, local_bs, loader.seq_per_img)
        if mesh is not None:
            from ..parallel.mesh import with_dp_sharding

            fc, att, labels, masks, top_words, fc1, att1 = with_dp_sharding(
                mesh, (fc, att, labels, masks, top_words, fc1, att1)
            )
        loss = loss_fn(params, fc, att, labels, masks, top_words)
        batch_ix["n"] += 1
        r = jax.random.fold_in(sample_rng, batch_ix["n"])
        return loss, sample_fn(params, fc1, att1, r)

    from ..decoding.serve import pipelined_map

    for data, (loss_dev, out) in pipelined_map(dispatch, batches(), depth=2):
        loss = float(loss_dev)
        loss_sum += loss
        loss_evals += 1
        sents = decode_sequence(vocab, np.asarray(out.seq))
        for k, sent in enumerate(sents):
            predictions.append({"image_id": data["infos"][k]["id"], "caption": sent})
            if getattr(opt, "print_beam_candidate", 0) and out.top_seq is not None:
                # print every surviving beam, best first (eval_utils.py:225-226)
                cands = decode_sequence(vocab, np.asarray(out.top_seq[k]))
                ps = np.asarray(out.top_p[k])
                for cand, p in zip(cands, ps):
                    if p > -1e29:
                        print(f"{data['infos'][k]['id']}\t{p:.3f}\t{cand}")
            if getattr(opt, "print_top_words", 0) and out.reason_preds:
                # top-10 predicted discriminative words per reason head
                # (eval_utils.py:227-237)
                for h, head in enumerate(out.reason_preds):
                    idx = np.argsort(-np.asarray(head[k]))[:10]
                    words = " ".join(loader.top_words[i] for i in idx
                                     if i < len(loader.top_words))
                    print(f"{data['infos'][k]['id']}_{h}\t{words}")

        if verbose:
            b = data["bounds"]
            print(f"evaluating {split} ... {b['it_pos_now']}/{b['it_max']} loss={loss:.3f}")

    predictions = trim_to_budget(predictions, loader, split, val_images_use)

    lang_stats = None
    # empty after the budget trim (a host whose rows all fall past the
    # global cut): scoring would crash on the empty corpus — the caller
    # gates on a count-weighted host_mean, so weight 0 carries no score
    if language_eval_flag and predictions:
        if gts_lookup is None:
            gts_lookup = default_gts_lookup(loader)

        lang_stats = language_eval(
            gts_lookup, predictions, f"eval_split_{opt.id}_{rank}", split,
            out_dir=getattr(opt, "eval_results_dir", "eval_results"),
        )
    return loss_sum / max(loss_evals, 1), predictions, lang_stats
