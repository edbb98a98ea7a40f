"""Construct a DataLoader from opt (file-backed or synthetic).

Feature backend resolution per encoder, in order:
  1. sharded columnar store at {data_root}/{encoder}/sharded/ (many-host)
  2. packed consolidated arrays at {data_root}/{encoder}/packed/ (TPU-first)
  3. reference-compatible per-image file dirs from the registry paths
  4. feature_type == 'synthetic': deterministic random features (smoke runs)
"""

from __future__ import annotations

import os

from .dataset import Dataset, DirFeatureSource, PackedFeatureSource, SyntheticFeatureSource
from .loader import DataLoader


def _check_dims(src, info, root: str):
    """A discovered store must match the registry geometry the model is
    built from — a densenet store extracted at att_size 14 (196 positions)
    would otherwise feed a model configured for 49, surfacing (if at all)
    as an opaque shape error deep in model apply."""
    got = (
        (src.fc_dim, src.att_num, src.att_dim)
        if hasattr(src, "fc_dim")
        else src.dims()
    )
    want = (info["fc_feat_size"], info["att_num"], info["att_feat_size"])
    if tuple(got) != tuple(want):
        raise ValueError(
            f"feature store at {root} has (fc_dim, att_num, att_dim)={got} "
            f"but the registry declares {want} for encoder "
            f"'{info['name']}' — re-extract with the encoder's native "
            f"geometry (see feature_extraction.extract.ARCH_GEOMETRY)"
        )
    return src


def _source_for(info, data_root: str, seed: int = 0):
    name = getattr(info, "name", "")
    sharded = os.path.join(data_root, name, "sharded")
    if name and os.path.exists(os.path.join(sharded, "manifest.json")):
        from .sharded import ShardedFeatureSource

        return _check_dims(ShardedFeatureSource(sharded), info, sharded)
    packed = os.path.join(data_root, name, "packed")
    if name and os.path.isdir(packed):
        return _check_dims(PackedFeatureSource(packed), info, packed)
    if hasattr(info, "variant_dirs"):
        from ..feat_registry import VARIANTS

        dirs = {v: info.variant_dirs(v) for v in VARIANTS}
        return DirFeatureSource(dirs)
    # plain dict entry (tests / synthetic)
    return SyntheticFeatureSource(
        info["fc_feat_size"], info["att_num"], info["att_feat_size"], seed=seed
    )


def build_loader(opt, *, prefetch: bool = True, synthetic: bool = False) -> DataLoader:
    if (synthetic or opt.feature_type == "synthetic") and not os.path.exists(
        opt.input_json
    ):
        # files-free smoke run: in-memory learnable corpus
        from .synthetic import synthetic_dataset

        dataset = synthetic_dataset(seed=opt.seed, correlated=True)
    else:
        dataset = Dataset.from_files(
            opt.input_json, opt.input_label_h5, opt.top_words_path, opt.top_words_count
        )
    feats = opt.feat_array_info
    if not feats:
        raise ValueError("opt.feat_array_info is empty; set feature_type")
    if synthetic or opt.feature_type == "synthetic":
        sources = [
            SyntheticFeatureSource(
                f["fc_feat_size"], f["att_num"], f["att_feat_size"], seed=opt.seed + i
            )
            for i, f in enumerate(feats)
        ]
    else:
        sources = [_source_for(f, opt.data_root, seed=opt.seed + i) for i, f in enumerate(feats)]
    if opt.feature_type not in ("feat_array",):
        sources = sources[:1]
    import jax

    # solo runs shard the input stream per host (each host loads its block
    # of the dp-sharded global batch); FLEETS must not — the vmapped seed
    # step broadcasts ONE batch to every seed (in_axes=None), so on a
    # multi-host fleet every host reads the identical full stream and only
    # the seed axis is sharded (multi_seed.py module docstring)
    if getattr(opt, "n_seeds", 1) > 1:
        host_shard = (0, 1)
    else:
        host_shard = (jax.process_index(), jax.process_count())
    return DataLoader(opt, dataset, sources, prefetch=prefetch,
                      host_shard=host_shard)
