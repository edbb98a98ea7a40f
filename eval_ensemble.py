"""Ensemble evaluation entry point.

CLI equivalent of the reference's eval_ensemble.py (:25-193): load N
checkpoints, decode with per-step mean logits (beam or greedy), optional
flip ensembling, full language metrics. Instead of the reference's
hard-coded 8 model ids (:30-37), pass --model_ids as a comma-separated list;
--rl_prefix 1 loads the rl_-prefixed checkpoints; --diff_feat 1 gives member
i the i-th encoder's features (the review_net diff-feat ensembles,
eval_utils.py:1026-1493).

  python eval_ensemble.py --model_path checkpoint \
      --model_ids seed1,seed2,seed3 --rl_prefix 1 --beam_size 3
"""

import argparse

from recurrent_fusion_network_tpu.config import parse_opt
from recurrent_fusion_network_tpu.data.build import build_loader
from recurrent_fusion_network_tpu.models import setup
from recurrent_fusion_network_tpu.training import checkpoint
from recurrent_fusion_network_tpu.training.eval_ensemble import eval_ensemble

from eval import merge_checkpoint_opt


def main():
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--model_ids", type=str, required=True,
                     help="comma-separated checkpoint ids; 'id:rank' selects "
                          "a specific rank (default rank 0)")
    pre.add_argument("--n_ranks", type=int, default=1,
                     help="with a single model id, load ranks 0..n_ranks-1 "
                          "(the vmapped fleet's per-seed checkpoints share "
                          "one id across ranks)")
    pre.add_argument("--rl_prefix", type=int, default=0)
    pre.add_argument("--diff_feat", type=int, default=0)
    pre_args, rest = pre.parse_known_args()
    opt = parse_opt(rest)

    ckpt_dir = opt.model_path or opt.checkpoint_path
    prefix = "rl_" if pre_args.rl_prefix else ""
    pairs = []
    for m in pre_args.model_ids.split(","):
        mid, _, rank = m.partition(":")
        pairs.append((mid, int(rank) if rank else 0))
    if pre_args.n_ranks > 1:
        assert len(pairs) == 1 and pairs[0][1] == 0, (
            "--n_ranks expands a SINGLE model id over ranks; do not combine "
            "with id lists or id:rank"
        )
        pairs = [(pairs[0][0], r) for r in range(pre_args.n_ranks)]
    members = []
    merged = False
    for mid, rank in pairs:
        # honor --checkpoint_backend (same resolution as serve.py/eval.py)
        params, _, infos = checkpoint.backend(opt).load_checkpoint(
            ckpt_dir, mid, rank, best=True, prefix=prefix)
        if not merged and "opt" in infos:
            merge_checkpoint_opt(opt, infos["opt"])
            merged = True
        members.append((infos.get("opt", {}), params))

    loader = build_loader(opt, synthetic=bool(opt.synthetic_features))
    opt.vocab_size = loader.vocab_size
    opt.seq_length = loader.seq_length

    model_members = []
    for saved_opt, params in members:
        from recurrent_fusion_network_tpu.config import Options

        mo = Options(**{**vars(opt), **{k: v for k, v in saved_opt.items()
                                        if k in ("caption_model", "rnn_size", "num_layers",
                                                 "input_encoding_size", "att_hid_size",
                                                 "num_review_steps", "num_review_steps_0",
                                                 "use_mos", "num_expert", "maxout",
                                                 "review_maxout", "fusion_maxout",
                                                 # architecture variant: each
                                                 # member keeps ITS trained
                                                 # (un)tied key layout
                                                 "tied_att_keys")}})
        mo.vocab_size = loader.vocab_size
        mo.seq_length = loader.seq_length
        model_members.append((setup(mo), params))

    try:
        preds, stats = eval_ensemble(
            model_members, loader, opt,
            split=opt.eval_split, beam_size=opt.beam_size,
            diff_feat=bool(pre_args.diff_feat),
            flip_ensemble=bool(opt.eval_flip_ensemble),
            verbose=bool(opt.verbose),
        )
    finally:
        loader.close()
    print(f"predictions: {len(preds)}")
    if stats:
        for k, v in stats.items():
            print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
