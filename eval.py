"""Single-model evaluation entry point.

CLI equivalent of the reference's eval.py (:28-99): load the checkpoint's
pickled opt, merge with CLI flags using the reference's ignore-list
semantics (CLI wins for runtime knobs, checkpoint wins for architecture),
then run eval_split on val/test.

  python eval.py --model_path checkpoint --load_model_id myrun \
      --eval_split test --beam_size 3
"""

from recurrent_fusion_network_tpu.config import Options, parse_opt
from recurrent_fusion_network_tpu.data.build import build_loader
from recurrent_fusion_network_tpu.models import setup
from recurrent_fusion_network_tpu.training import checkpoint
from recurrent_fusion_network_tpu.training.eval_split import eval_split

# flags the CLI controls at eval time even when a checkpoint opt exists
# (reference eval.py:28-48 ignore-list)
CLI_WINS = {
    "beam_size", "eval_split", "val_images_use", "language_eval", "sample_max",
    "batch_size", "seq_per_img", "input_json", "input_label_h5",
    "top_words_path", "data_root", "synthetic_features", "verbose", "id",
    "model_path", "infos_path", "load_model_id", "eval_flip_ensemble",
    # eval-time diagnostics/knobs the checkpoint's training defaults must
    # not silently reset (the reference ignore-list owns these at CLI too)
    "print_beam_candidate", "print_top_words", "seed",
    "spice_backend", "ip", "port",
    # runtime knobs the checkpoint must not override at eval time
    "dtype", "profile_dir", "profile_steps", "checkpoint_async",
    # raw-image mode: checkpoints save image_folder=\"\" (the training
    # default), which would clobber --image_folder and silently disable it
    "image_folder", "image_root", "backbone_weights", "backbone_arch",
}


def merge_checkpoint_opt(opt, saved: dict):
    for k, v in saved.items():
        if k in CLI_WINS or k in ("vocab_size", "seq_length", "start_from",
                                  "checkpoint_path", "current_lr",
                                  "feat_array_info"):
            continue
        setattr(opt, k, v)
    # pre-profile-flip checkpoints carry no tied_att_keys: their weights
    # are the reference (untied) architecture — the CLI-resolved TPU-native
    # default (tied) would KeyError deep inside encode
    if "tied_att_keys" not in saved:
        opt.tied_att_keys = 0
    # same for pre-r5 checkpoints and the low_rank_ctx variant flag (its
    # opt-in default is 0, so only a stale CLI override could disagree)
    if "low_rank_ctx" not in saved:
        opt.low_rank_ctx = 0
    # feature wiring re-derives under the CLI --data_root: the checkpoint's
    # EncoderInfo objects froze the TRAINING machine's directory paths, so
    # copying them would point dir-backed features at stale locations.
    # Path-free dict entries (synthetic/test dims) copy through unchanged.
    saved_fai = saved.get("feat_array_info")
    if saved_fai and all(isinstance(f, dict) for f in saved_fai):
        opt.feat_array_info = saved_fai
    elif saved_fai:
        from recurrent_fusion_network_tpu.config import _wire_features

        # _wire_features no-ops when feat_array_info is already set (the
        # CLI parse wired it for the CLI feature_type); clear it so the
        # wiring re-derives for the MERGED feature_type under CLI paths
        opt.feat_array_info = None
        _wire_features(opt)
    return opt


def main():
    import argparse

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--rl_prefix", type=int, default=0,
                     help="load the rl_-prefixed (SCST) checkpoint")
    pre.add_argument("--rank", type=int, default=0,
                     help="checkpoint rank (fleet seed index)")
    pre_args, rest = pre.parse_known_args()
    opt = parse_opt(rest)
    ckpt_dir = opt.model_path or opt.checkpoint_path
    import os as _os

    if _os.path.isfile(ckpt_dir):
        # reference eval.py took a FILE; the triple-file contract here
        # takes the checkpoint DIRECTORY + --load_model_id — fail with the
        # fix instead of a confusing join-through-a-file FileNotFoundError
        d, f = _os.path.split(ckpt_dir)
        raise SystemExit(
            f"--model_path must be the checkpoint DIRECTORY (got file "
            f"{ckpt_dir!r}); try --model_path {d or '.'} with "
            f"--load_model_id <id> (file {f!r} follows "
            f"model_{{id}}_{{rank}} naming)"
        )
    if getattr(opt, "infos_path", ""):
        print("note: --infos_path is ignored here — infos load from "
              "model_path/load_model_id (triple-file contract)")
    # honor --checkpoint_backend (orbax checkpoints must be evaluable
    # too — same altitude as serve.py's loader resolution)
    params, _, infos = checkpoint.backend(opt).load_checkpoint(
        ckpt_dir, opt.load_model_id, pre_args.rank, best=True,
        prefix="rl_" if pre_args.rl_prefix else "",
    )
    if "opt" in infos:
        merge_checkpoint_opt(opt, infos["opt"])

    if opt.image_folder:
        # caption raw images end-to-end (reference --image_folder mode)
        from recurrent_fusion_network_tpu.training.eval_folder import eval_image_folder

        vocab = infos.get("vocab")
        assert vocab, "checkpoint infos missing vocab (needed for --image_folder)"
        opt.vocab_size = len(vocab)
        opt.seq_length = infos.get("opt", {}).get("seq_length") or 16
        model = setup(opt)
        preds = eval_image_folder(
            model, params, vocab, opt.image_folder,
            beam_size=opt.beam_size, batch_size=opt.batch_size,
            backbone_weights=getattr(opt, "backbone_weights", None) or None,
        )
        for p in preds:
            print(f"{p['file']}\t{p['caption']}")
        return

    loader = build_loader(opt, synthetic=bool(opt.synthetic_features))
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length
    model = setup(opt)
    try:
        loss, preds, stats = eval_split(
            model, params, loader, opt,
            split=opt.eval_split, beam_size=opt.beam_size, verbose=bool(opt.verbose),
        )
    finally:
        loader.close()
    print(f"loss: {loss:.4f}")
    if stats:
        for k, v in stats.items():
            print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
