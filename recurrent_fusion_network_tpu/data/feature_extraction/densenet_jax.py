"""Pure-JAX DenseNet feature backbone.

Replaces the reference's torchvision-DenseNet-161 extractor
(data/feature_extraction/densenet_pytorch/extract_feats_densenet161.py):
dense blocks (bn-relu-conv1x1 -> bn-relu-conv3x3, concat), transition layers
(bn-relu-conv1x1 + 2x2 avgpool), final bn-relu; emits

  fc  = global spatial mean of the final feature map   (2208,) for -161
  att = adaptive average pool to (att_size, att_size)  e.g. 7x7=49 positions

matching the registry dims (feat_registry: densenet fc 2208 att 2208x49).
``load_torch_state_dict`` converts a torchvision ``densenet*.pth`` state dict.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .resnet_jax import IMAGENET_MEAN, IMAGENET_STD, _bn_init, _conv_init, _torch_adaptive_pool, bn, conv, max_pool


@dataclasses.dataclass(frozen=True)
class DenseNetConfig:
    blocks: Tuple[int, ...] = (6, 12, 36, 24)  # densenet-161
    growth: int = 48
    init_features: int = 96
    bn_size: int = 4
    att_size: int = 7

    @classmethod
    def densenet121(cls):
        return cls(blocks=(6, 12, 24, 16), growth=32, init_features=64)

    @classmethod
    def densenet161(cls):
        return cls(blocks=(6, 12, 36, 24), growth=48, init_features=96)

    @property
    def out_features(self) -> int:
        c = self.init_features
        for i, n in enumerate(self.blocks):
            c += n * self.growth
            if i < len(self.blocks) - 1:
                c = c // 2
        return c


def densenet_init(key, config: DenseNetConfig = DenseNetConfig()) -> Dict:
    k = iter(jax.random.split(key, 4096))
    params: Dict = {
        "conv0": {"w": _conv_init(next(k), 7, 7, 3, config.init_features)},
        "bn0": _bn_init(config.init_features),
    }
    c = config.init_features
    for bi, n_layers in enumerate(config.blocks, start=1):
        layers = []
        for _ in range(n_layers):
            inter = config.bn_size * config.growth
            layers.append(
                {
                    "bn1": _bn_init(c),
                    "conv1": {"w": _conv_init(next(k), 1, 1, c, inter)},
                    "bn2": _bn_init(inter),
                    "conv2": {"w": _conv_init(next(k), 3, 3, inter, config.growth)},
                }
            )
            c += config.growth
        params[f"block{bi}"] = layers
        if bi < len(config.blocks):
            params[f"trans{bi}"] = {
                "bn": _bn_init(c),
                "conv": {"w": _conv_init(next(k), 1, 1, c, c // 2)},
            }
            c //= 2
    params["bn_final"] = _bn_init(c)
    return params


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def densenet_features(params, images, config: DenseNetConfig = DenseNetConfig()):
    """images (B, H, W, 3) in [0,1] -> (fc (B, C), att (B, S, S, C))."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = (images - mean) / std
    x = jax.nn.relu(bn(conv(x, params["conv0"]["w"], stride=2), params["bn0"]))
    x = max_pool(x)
    for bi, n_layers in enumerate(config.blocks, start=1):
        for layer in params[f"block{bi}"]:
            h = jax.nn.relu(bn(x, layer["bn1"]))
            h = conv(h, layer["conv1"]["w"])
            h = jax.nn.relu(bn(h, layer["bn2"]))
            h = conv(h, layer["conv2"]["w"])
            x = jnp.concatenate([x, h], axis=-1)
        if bi < len(config.blocks):
            t = params[f"trans{bi}"]
            x = conv(jax.nn.relu(bn(x, t["bn"])), t["conv"]["w"])
            x = _avg_pool2(x)
    x = jax.nn.relu(bn(x, params["bn_final"]))
    fc = jnp.mean(x, axis=(1, 2))
    S = config.att_size
    att = x if x.shape[1] == S and x.shape[2] == S else _torch_adaptive_pool(x, S)
    return fc, att


def load_torch_state_dict(state_dict, config: DenseNetConfig = DenseNetConfig()) -> Dict:
    """Convert a torchvision DenseNet state dict (features.* naming)."""

    def arr(name):
        v = state_dict[name]
        v = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        return jnp.asarray(v)

    def conv_w(name):
        return jnp.transpose(arr(name), (2, 3, 1, 0))

    def bn_p(prefix):
        return {
            "scale": arr(prefix + ".weight"),
            "bias": arr(prefix + ".bias"),
            "mean": arr(prefix + ".running_mean"),
            "var": arr(prefix + ".running_var"),
        }

    params: Dict = {
        "conv0": {"w": conv_w("features.conv0.weight")},
        "bn0": bn_p("features.norm0"),
    }
    for bi, n_layers in enumerate(config.blocks, start=1):
        layers = []
        for li in range(1, n_layers + 1):
            pre = f"features.denseblock{bi}.denselayer{li}"
            layers.append(
                {
                    "bn1": bn_p(pre + ".norm1"),
                    "conv1": {"w": conv_w(pre + ".conv1.weight")},
                    "bn2": bn_p(pre + ".norm2"),
                    "conv2": {"w": conv_w(pre + ".conv2.weight")},
                }
            )
        params[f"block{bi}"] = layers
        if bi < len(config.blocks):
            pre = f"features.transition{bi}"
            params[f"trans{bi}"] = {
                "bn": bn_p(pre + ".norm"),
                "conv": {"w": conv_w(pre + ".conv.weight")},
            }
    params["bn_final"] = bn_p("features.norm5")
    return params
