"""Backbone dispatch for extraction / image-folder eval."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax

from . import densenet_jax, inception_jax, resnet_jax

ARCHS = (
    "resnet50", "resnet101", "resnet152", "densenet121", "densenet161",
    "inception_v3", "inception_v4", "inception_resnet_v2",
)


def build_backbone(
    arch: str,
    att_size: int,
    torch_weights: Optional[str] = None,
    seed: int = 0,
) -> Tuple[dict, Callable, int, int]:
    """Returns (params, features_fn(params, images) -> (fc, att_grid),
    fc_dim, att_dim). fc_dim == att_dim for every arch except inception_v3
    (fc tap 2048 @ Mixed_7c, att tap 1280 @ Mixed_7a — feat_registry dims)."""
    if arch.startswith("resnet"):
        cfg = getattr(resnet_jax.ResNetConfig, arch)()
        cfg = resnet_jax.ResNetConfig(blocks=cfg.blocks, att_size=att_size)
        init, feats, loader = (
            resnet_jax.resnet_init,
            resnet_jax.resnet_features,
            resnet_jax.load_torch_state_dict,
        )
        out_c = cfg.width * 32
    elif arch.startswith("densenet"):
        cfg = getattr(densenet_jax.DenseNetConfig, arch)()
        cfg = densenet_jax.DenseNetConfig(
            blocks=cfg.blocks, growth=cfg.growth,
            init_features=cfg.init_features, att_size=att_size,
        )
        init, feats, loader = (
            densenet_jax.densenet_init,
            densenet_jax.densenet_features,
            densenet_jax.load_torch_state_dict,
        )
        out_c = cfg.out_features
    elif arch in inception_jax._TRUNKS:
        # Inception nets run at the canonical 299x299 input (8x8 att grid);
        # weights convert from TF-slim checkpoints offline (load_flat_npz)
        _, fc_dim, att_dim = inception_jax._TRUNKS[arch]
        if torch_weights:
            params = inception_jax.load_flat_npz(torch_weights)
            print(f"loaded flat-npz weights from {torch_weights}")
        else:
            params = inception_jax.inception_init(arch, jax.random.PRNGKey(seed))
            print("WARNING: random backbone weights (smoke run only)")
        feats = lambda p, imgs: inception_jax.inception_features(arch, p, imgs)
        return params, feats, fc_dim, att_dim
    else:
        raise ValueError(f"arch not supported: {arch}; choose from {ARCHS}")

    if torch_weights:
        import torch

        sd = torch.load(torch_weights, map_location="cpu", weights_only=True)
        params = loader(sd, cfg)
        print(f"loaded torch weights from {torch_weights}")
    else:
        params = init(jax.random.PRNGKey(seed), cfg)
        print("WARNING: random backbone weights (smoke run only)")

    return params, (lambda p, imgs: feats(p, imgs, cfg)), out_c, out_c
