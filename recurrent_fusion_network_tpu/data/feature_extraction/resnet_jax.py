"""Pure-JAX ResNet v1 feature backbone.

Replaces the reference's torchvision-ResNet extractor
(data/feature_extraction/resnet/misc/resnet_utils.py:28-50 myResnet): runs
the conv stack, emits

  fc  = global spatial mean of the last stage          (C,)   [:45]
  att = adaptive average pool to (att_size, att_size)  (S,S,C) [:47]

with torch's adaptive-pooling bin arithmetic (start = a*c//b,
end = ceil((a+1)*c/b) — resnet_utils.py:13-25) reproduced exactly.

NHWC layout, inference-mode batch norm. ``load_torch_state_dict`` converts a
torchvision ``resnet*.pth`` state dict into this param tree (no weights ship
in-repo: the build sandbox has no network access).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    blocks: Tuple[int, ...] = (3, 4, 23, 3)  # resnet-101
    width: int = 64
    att_size: int = 14

    @classmethod
    def resnet50(cls):
        return cls(blocks=(3, 4, 6, 3))

    @classmethod
    def resnet101(cls):
        return cls(blocks=(3, 4, 23, 3))

    @classmethod
    def resnet152(cls):
        return cls(blocks=(3, 8, 36, 3))


# ---------------------------------------------------------------- primitives


def _conv_init(key, kh, kw, cin, cout):
    fan = kh * kw * cin
    std = math.sqrt(2.0 / fan)  # torch kaiming_normal fan_out-ish
    return jax.random.normal(key, (kh, kw, cin, cout)) * std


def _bn_init(c):
    return {
        "scale": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)),
        "var": jnp.ones((c,)),
    }


def conv(x, w, stride=1, padding="TORCH"):
    """Conv with TORCH padding semantics by default: symmetric pad (k-1)//2.

    XLA's 'SAME' pads asymmetrically for stride-2 on even inputs ((0,1) for
    3x3, (2,3) for 7x7) while torch pads symmetrically — with pretrained
    torchvision weights the two diverge badly at every stride-2 layer, so
    explicit symmetric padding is the correct default here.
    """
    if padding == "TORCH":
        ph = (w.shape[0] - 1) // 2
        pw = (w.shape[1] - 1) // 2
        padding = [(ph, ph), (pw, pw)]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def max_pool(x, window=3, stride=2):
    """torch MaxPool2d(window, stride, padding=(window-1)//2) semantics."""
    p = (window - 1) // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (p, p), (p, p), (0, 0)],
    )


# ------------------------------------------------------------------- builder


def resnet_init(key, config: ResNetConfig = ResNetConfig()) -> Dict:
    params: Dict = {}
    k = iter(jax.random.split(key, 4096))
    params["conv1"] = {"w": _conv_init(next(k), 7, 7, 3, config.width)}
    params["bn1"] = _bn_init(config.width)
    cin = config.width
    for stage, n_blocks in enumerate(config.blocks, start=1):
        planes = config.width * (2 ** (stage - 1))
        cout = planes * 4
        blocks: List[Dict] = []
        for b in range(n_blocks):
            stride = 2 if (stage > 1 and b == 0) else 1
            blk = {
                "conv1": {"w": _conv_init(next(k), 1, 1, cin, planes)},
                "bn1": _bn_init(planes),
                "conv2": {"w": _conv_init(next(k), 3, 3, planes, planes)},
                "bn2": _bn_init(planes),
                "conv3": {"w": _conv_init(next(k), 1, 1, planes, cout)},
                "bn3": _bn_init(cout),
            }
            if b == 0 and (stride != 1 or cin != cout):
                blk["downsample"] = {
                    "conv": {"w": _conv_init(next(k), 1, 1, cin, cout)},
                    "bn": _bn_init(cout),
                }
            blocks.append(blk)
            cin = cout
        params[f"layer{stage}"] = blocks
    return params


def _bottleneck(x, blk, stride):
    out = jax.nn.relu(bn(conv(x, blk["conv1"]["w"]), blk["bn1"]))
    out = jax.nn.relu(bn(conv(out, blk["conv2"]["w"], stride=stride), blk["bn2"]))
    out = bn(conv(out, blk["conv3"]["w"]), blk["bn3"])
    if "downsample" in blk:
        x = bn(conv(x, blk["downsample"]["conv"]["w"], stride=stride),
               blk["downsample"]["bn"])
    return jax.nn.relu(out + x)


def _torch_adaptive_pool(x, out_size: int):
    """torch F.adaptive_avg_pool2d bins (resnet_utils.py:13-25) on NHWC."""
    B, H, W, C = x.shape
    rows = []
    for oh in range(out_size):
        i1, i2 = oh * H // out_size, math.ceil((oh + 1) * H / out_size)
        cols = []
        for ow in range(out_size):
            j1, j2 = ow * W // out_size, math.ceil((ow + 1) * W / out_size)
            cols.append(jnp.mean(x[:, i1:i2, j1:j2, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, S, S, C)


def resnet_features(params, images, config: ResNetConfig = ResNetConfig()):
    """images: (B, H, W, 3) float in [0, 1], H and W multiples of 32
    recommended (448 -> exact 14x14 grid).

    Returns (fc (B, C), att (B, S, S, C)) with C = width*32.
    """
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = (images - mean) / std
    x = jax.nn.relu(bn(conv(x, params["conv1"]["w"], stride=2), params["bn1"]))
    x = max_pool(x)
    for stage, n_blocks in enumerate(config.blocks, start=1):
        for b in range(n_blocks):
            stride = 2 if (stage > 1 and b == 0) else 1
            x = _bottleneck(x, params[f"layer{stage}"][b], stride)
    fc = jnp.mean(x, axis=(1, 2))
    S = config.att_size
    if x.shape[1] == S and x.shape[2] == S:
        att = x
    else:
        att = _torch_adaptive_pool(x, S)
    return fc, att


# -------------------------------------------------------------- torch import


def load_torch_state_dict(state_dict, config: ResNetConfig = ResNetConfig()) -> Dict:
    """Convert a torchvision ResNet state dict (tensor or ndarray values) to
    this module's param tree. Conv weights transpose OIHW -> HWIO."""

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
        "conv1": {"w": conv_w("conv1.weight")},
        "bn1": bn_p("bn1"),
    }
    for stage, n_blocks in enumerate(config.blocks, start=1):
        blocks = []
        for b in range(n_blocks):
            pre = f"layer{stage}.{b}"
            blk = {
                "conv1": {"w": conv_w(pre + ".conv1.weight")},
                "bn1": bn_p(pre + ".bn1"),
                "conv2": {"w": conv_w(pre + ".conv2.weight")},
                "bn2": bn_p(pre + ".bn2"),
                "conv3": {"w": conv_w(pre + ".conv3.weight")},
                "bn3": bn_p(pre + ".bn3"),
            }
            if pre + ".downsample.0.weight" in state_dict:
                blk["downsample"] = {
                    "conv": {"w": conv_w(pre + ".downsample.0.weight")},
                    "bn": bn_p(pre + ".downsample.1"),
                }
            blocks.append(blk)
        params[f"layer{stage}"] = blocks
    return params
