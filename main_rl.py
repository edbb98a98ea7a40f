"""Self-critical (SCST) RL training entry point.

CLI equivalent of the reference's main_rl.py + train_rl.py. Warm starts from
the XE best checkpoint via --start_from/--load_model_id
(train_recurrent_fusion_model_rl.sh:16-36) and rewards with train-idf
CIDEr-D (--cider_df points at the prepro_ngrams pickle; defaults to
data/coco-train-idxs.p like the reference's CiderD(df='coco-train-idxs')).
"""

import argparse
import sys

from recurrent_fusion_network_tpu.config import parse_opt
from recurrent_fusion_network_tpu.data.build import build_loader
from recurrent_fusion_network_tpu.rewards.cider_d import CiderD
from recurrent_fusion_network_tpu.training.train_rl_loop import train_rl


def main():
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--cider_df", type=str, default="data/coco-train-idxs.p")
    pre_args, rest = pre.parse_known_args()
    opt = parse_opt(rest)
    # tensor parallelism is a solo-XE capability (main.py): fail BEFORE
    # building the loader / the minutes-long doc-freq fallback
    assert getattr(opt, "num_mp_devices", 1) <= 1, (
        "--num_mp_devices is not supported by the RL loop; use it with "
        "main.py (solo XE) and run SCST on a dp mesh"
    )
    loader = build_loader(opt, synthetic=bool(opt.synthetic_features))
    try:
        scorer = CiderD.from_pickle(pre_args.cider_df)
    except FileNotFoundError:
        print(
            f"cider df pickle not found at {pre_args.cider_df}; building from "
            "the train split labels (slower first run)"
        )
        import numpy as np

        from recurrent_fusion_network_tpu.data.prepro_ngrams import compute_doc_freq

        ids = loader.split_image_id["train"]
        df = compute_doc_freq(loader.dataset, ids)
        scorer = CiderD(df, float(np.log(len(ids))))
    mesh = None
    if opt.async_opt and opt.num_dp_devices <= 1:
        # Hogwild -> sync DP, same mapping as main.py
        import jax

        opt.num_dp_devices = min(opt.num_processes, len(jax.devices()))
        print(f"--async_opt 1 -> synchronous DP over "
              f"{opt.num_dp_devices} device(s)")
    if opt.num_dp_devices > 1:
        from recurrent_fusion_network_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(opt.num_dp_devices)
    try:
        max_it = opt.max_iterations if opt.max_iterations > 0 else None
        if opt.n_seeds > 1:
            from recurrent_fusion_network_tpu.training.multi_seed import (
                train_multi_seed_rl,
            )

            # with a mesh, the SEED axis shards across devices
            # (fleet-over-mesh: one seed group per device)
            train_multi_seed_rl(opt, loader, scorer, opt.n_seeds,
                                max_iterations=max_it, mesh=mesh)
        else:
            train_rl(opt, loader, scorer, rank=0, mesh=mesh,
                     max_iterations=max_it)
    finally:
        loader.close()


if __name__ == "__main__":
    main()
