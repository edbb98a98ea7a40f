"""Pure-JAX Inception-V3 / Inception-V4 / Inception-ResNet-V2 backbones.

Replace the reference's ~26k LoC of vendored TF-slim extractor trees
(data/feature_extraction/inception_*/). Feature taps match the reference's
modified nets exactly:

  V3  : att = Mixed_7a output (1280 @ 8x8=64), fc = global mean of Mixed_7c
        (2048)                      [nets/inception_v3.py:511-528]
  V4  : att = final Inception-C output (1536 @ 8x8), fc = its global mean
        (1536)                      [nets/inception_v4.py:309-332]
  IRv2: att = Conv2d_7b_1x1 output (1536 @ 8x8), fc = its global mean
        (1536)                      [nets/inception_resnet_v2.py:254-255]

matching the registry dims (feat_registry: inception_v3 2048/1280x64,
inception_v4 1536/1536x64, inception_resnet_v2 1536/1536x64) at the canonical
299x299 input.

Parameters live in a FLAT dict keyed by hierarchical names
("Mixed_5b/Branch_1/Conv2d_0a_1x1/w", ".../bn/scale", ...) built by a
shape-inferring ParamBuilder — one code path serves both initialization and
application, and the naming makes offline TF-checkpoint conversion a pure
key-mapping exercise (dump the slim checkpoint to npz with TF elsewhere, then
`load_flat_npz`).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .resnet_jax import IMAGENET_MEAN, IMAGENET_STD


class ParamBuilder:
    """Shape-inferring conv/bn parameter store with slim-style flat names."""

    def __init__(self, params: Optional[Dict] = None, rng=None):
        self.init_mode = params is None
        self.params: Dict = {} if params is None else params
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._scope = []

    # ------------------------------------------------------------- scoping
    def scope(self, name):
        pb = self

        class _Ctx:
            def __enter__(self_inner):
                pb._scope.append(name)

            def __exit__(self_inner, *a):
                pb._scope.pop()

        return _Ctx()

    def _name(self, leaf):
        return "/".join(self._scope + [leaf])

    def _get(self, leaf, shape, init_fn):
        name = self._name(leaf)
        if self.init_mode:
            if name not in self.params:
                self._rng, k = jax.random.split(self._rng)
                self.params[name] = init_fn(k, shape)
        return self.params[name]

    # ---------------------------------------------------------------- ops
    def conv_bn(self, name, x, filters, kh, kw=None, stride=1, padding="SAME",
                relu=True):
        """slim.conv2d default: conv (no bias) + batch norm + relu."""
        kw = kh if kw is None else kw
        cin = x.shape[-1]

        def w_init(k, shape):
            fan = shape[0] * shape[1] * shape[2]
            return jax.random.normal(k, shape) * math.sqrt(2.0 / fan)

        with self.scope(name):
            w = self._get("w", (kh, kw, cin, filters), w_init)
            x = jax.lax.conv_general_dilated(
                x, w, (stride, stride), padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            zeros = lambda k, s: jnp.zeros(s)
            ones = lambda k, s: jnp.ones(s)
            scale = self._get("bn/scale", (filters,), ones)
            bias = self._get("bn/bias", (filters,), zeros)
            mean = self._get("bn/mean", (filters,), zeros)
            var = self._get("bn/var", (filters,), ones)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(x) if relu else x


def max_pool(x, k=3, stride=2, padding="VALID"):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1), padding
    )


def avg_pool(x, k=3, stride=1, padding="SAME"):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, stride, stride, 1), padding
    )
    n = jax.lax.reduce_window(
        jnp.ones_like(x[..., :1]), 0.0, jax.lax.add,
        (1, k, k, 1), (1, stride, stride, 1), padding,
    )
    return s / n


def _preprocess(images):
    """slim inception preprocessing maps [0,1] -> [-1, 1]."""
    return images * 2.0 - 1.0


# =========================================================== Inception-V3


def _v3_trunk(x, pb: ParamBuilder):
    c = pb.conv_bn
    x = c("Conv2d_1a_3x3", x, 32, 3, stride=2, padding="VALID")
    x = c("Conv2d_2a_3x3", x, 32, 3, padding="VALID")
    x = c("Conv2d_2b_3x3", x, 64, 3)
    x = max_pool(x)
    x = c("Conv2d_3b_1x1", x, 80, 1, padding="VALID")
    x = c("Conv2d_4a_3x3", x, 192, 3, padding="VALID")
    x = max_pool(x)

    def mixed_5(name, pool_proj):
        nonlocal x
        with pb.scope(name):
            b0 = c("Branch_0/Conv2d_0a_1x1", x, 64, 1)
            b1 = c("Branch_1/Conv2d_0a_1x1", x, 48, 1)
            b1 = c("Branch_1/Conv2d_0b_5x5", b1, 64, 5)
            b2 = c("Branch_2/Conv2d_0a_1x1", x, 64, 1)
            b2 = c("Branch_2/Conv2d_0b_3x3", b2, 96, 3)
            b2 = c("Branch_2/Conv2d_0c_3x3", b2, 96, 3)
            b3 = c("Branch_3/Conv2d_0b_1x1", avg_pool(x), pool_proj, 1)
            x = jnp.concatenate([b0, b1, b2, b3], -1)

    mixed_5("Mixed_5b", 32)
    mixed_5("Mixed_5c", 64)
    mixed_5("Mixed_5d", 64)

    with pb.scope("Mixed_6a"):
        b0 = c("Branch_0/Conv2d_1a_1x1", x, 384, 3, stride=2, padding="VALID")
        b1 = c("Branch_1/Conv2d_0a_1x1", x, 64, 1)
        b1 = c("Branch_1/Conv2d_0b_3x3", b1, 96, 3)
        b1 = c("Branch_1/Conv2d_1a_1x1", b1, 96, 3, stride=2, padding="VALID")
        x = jnp.concatenate([b0, b1, max_pool(x)], -1)  # 768

    def mixed_6(name, mid):
        nonlocal x
        with pb.scope(name):
            b0 = c("Branch_0/Conv2d_0a_1x1", x, 192, 1)
            b1 = c("Branch_1/Conv2d_0a_1x1", x, mid, 1)
            b1 = c("Branch_1/Conv2d_0b_1x7", b1, mid, 1, 7)
            b1 = c("Branch_1/Conv2d_0c_7x1", b1, 192, 7, 1)
            b2 = c("Branch_2/Conv2d_0a_1x1", x, mid, 1)
            b2 = c("Branch_2/Conv2d_0b_7x1", b2, mid, 7, 1)
            b2 = c("Branch_2/Conv2d_0c_1x7", b2, mid, 1, 7)
            b2 = c("Branch_2/Conv2d_0d_7x1", b2, mid, 7, 1)
            b2 = c("Branch_2/Conv2d_0e_1x7", b2, 192, 1, 7)
            b3 = c("Branch_3/Conv2d_0b_1x1", avg_pool(x), 192, 1)
            x = jnp.concatenate([b0, b1, b2, b3], -1)

    mixed_6("Mixed_6b", 128)
    mixed_6("Mixed_6c", 160)
    mixed_6("Mixed_6d", 160)
    mixed_6("Mixed_6e", 192)

    with pb.scope("Mixed_7a"):
        b0 = c("Branch_0/Conv2d_0a_1x1", x, 192, 1)
        b0 = c("Branch_0/Conv2d_1a_3x3", b0, 320, 3, stride=2, padding="VALID")
        b1 = c("Branch_1/Conv2d_0a_1x1", x, 192, 1)
        b1 = c("Branch_1/Conv2d_0b_1x7", b1, 192, 1, 7)
        b1 = c("Branch_1/Conv2d_0c_7x1", b1, 192, 7, 1)
        b1 = c("Branch_1/Conv2d_1a_3x3", b1, 192, 3, stride=2, padding="VALID")
        x = jnp.concatenate([b0, b1, max_pool(x)], -1)  # 1280
    att = x

    def mixed_7(name):
        nonlocal x
        with pb.scope(name):
            b0 = c("Branch_0/Conv2d_0a_1x1", x, 320, 1)
            b1 = c("Branch_1/Conv2d_0a_1x1", x, 384, 1)
            b1 = jnp.concatenate(
                [c("Branch_1/Conv2d_0b_1x3", b1, 384, 1, 3),
                 c("Branch_1/Conv2d_0c_3x1", b1, 384, 3, 1)], -1)
            b2 = c("Branch_2/Conv2d_0a_1x1", x, 448, 1)
            b2 = c("Branch_2/Conv2d_0b_3x3", b2, 384, 3)
            b2 = jnp.concatenate(
                [c("Branch_2/Conv2d_0c_1x3", b2, 384, 1, 3),
                 c("Branch_2/Conv2d_0d_3x1", b2, 384, 3, 1)], -1)
            b3 = c("Branch_3/Conv2d_0b_1x1", avg_pool(x), 192, 1)
            x = jnp.concatenate([b0, b1, b2, b3], -1)  # 2048

    mixed_7("Mixed_7b")
    mixed_7("Mixed_7c")
    return att, x


# =========================================================== Inception-V4


def _v4_block_a(x, pb, name):
    c = pb.conv_bn
    with pb.scope(name):
        b0 = c("Branch_0/Conv2d_0a_1x1", x, 96, 1)
        b1 = c("Branch_1/Conv2d_0a_1x1", x, 64, 1)
        b1 = c("Branch_1/Conv2d_0b_3x3", b1, 96, 3)
        b2 = c("Branch_2/Conv2d_0a_1x1", x, 64, 1)
        b2 = c("Branch_2/Conv2d_0b_3x3", b2, 96, 3)
        b2 = c("Branch_2/Conv2d_0c_3x3", b2, 96, 3)
        b3 = c("Branch_3/Conv2d_0b_1x1", avg_pool(x), 96, 1)
        return jnp.concatenate([b0, b1, b2, b3], -1)  # 384


def _v4_block_b(x, pb, name):
    c = pb.conv_bn
    with pb.scope(name):
        b0 = c("Branch_0/Conv2d_0a_1x1", x, 384, 1)
        b1 = c("Branch_1/Conv2d_0a_1x1", x, 192, 1)
        b1 = c("Branch_1/Conv2d_0b_1x7", b1, 224, 1, 7)
        b1 = c("Branch_1/Conv2d_0c_7x1", b1, 256, 7, 1)
        b2 = c("Branch_2/Conv2d_0a_1x1", x, 192, 1)
        b2 = c("Branch_2/Conv2d_0b_7x1", b2, 192, 7, 1)
        b2 = c("Branch_2/Conv2d_0c_1x7", b2, 224, 1, 7)
        b2 = c("Branch_2/Conv2d_0d_7x1", b2, 224, 7, 1)
        b2 = c("Branch_2/Conv2d_0e_1x7", b2, 256, 1, 7)
        b3 = c("Branch_3/Conv2d_0b_1x1", avg_pool(x), 128, 1)
        return jnp.concatenate([b0, b1, b2, b3], -1)  # 1024


def _v4_block_c(x, pb, name):
    c = pb.conv_bn
    with pb.scope(name):
        b0 = c("Branch_0/Conv2d_0a_1x1", x, 256, 1)
        b1 = c("Branch_1/Conv2d_0a_1x1", x, 384, 1)
        b1 = jnp.concatenate(
            [c("Branch_1/Conv2d_0b_1x3", b1, 256, 1, 3),
             c("Branch_1/Conv2d_0c_3x1", b1, 256, 3, 1)], -1)
        b2 = c("Branch_2/Conv2d_0a_1x1", x, 384, 1)
        b2 = c("Branch_2/Conv2d_0b_3x1", b2, 448, 3, 1)
        b2 = c("Branch_2/Conv2d_0c_1x3", b2, 512, 1, 3)
        b2 = jnp.concatenate(
            [c("Branch_2/Conv2d_0d_1x3", b2, 256, 1, 3),
             c("Branch_2/Conv2d_0e_3x1", b2, 256, 3, 1)], -1)
        b3 = c("Branch_3/Conv2d_0b_1x1", avg_pool(x), 256, 1)
        return jnp.concatenate([b0, b1, b2, b3], -1)  # 1536


def _v4_trunk(x, pb: ParamBuilder):
    c = pb.conv_bn
    x = c("Conv2d_1a_3x3", x, 32, 3, stride=2, padding="VALID")
    x = c("Conv2d_2a_3x3", x, 32, 3, padding="VALID")
    x = c("Conv2d_2b_3x3", x, 64, 3)
    with pb.scope("Mixed_3a"):
        x = jnp.concatenate(
            [max_pool(x), c("Branch_1/Conv2d_0a_3x3", x, 96, 3, stride=2,
                            padding="VALID")], -1)
    with pb.scope("Mixed_4a"):
        b0 = c("Branch_0/Conv2d_0a_1x1", x, 64, 1)
        b0 = c("Branch_0/Conv2d_1a_3x3", b0, 96, 3, padding="VALID")
        b1 = c("Branch_1/Conv2d_0a_1x1", x, 64, 1)
        b1 = c("Branch_1/Conv2d_0b_1x7", b1, 64, 1, 7)
        b1 = c("Branch_1/Conv2d_0c_7x1", b1, 64, 7, 1)
        b1 = c("Branch_1/Conv2d_1a_3x3", b1, 96, 3, padding="VALID")
        x = jnp.concatenate([b0, b1], -1)
    with pb.scope("Mixed_5a"):
        x = jnp.concatenate(
            [c("Branch_0/Conv2d_1a_3x3", x, 192, 3, stride=2, padding="VALID"),
             max_pool(x)], -1)  # 384

    for i in range(4):
        x = _v4_block_a(x, pb, f"Mixed_5{'bcde'[i]}")
    with pb.scope("Mixed_6a"):  # reduction A (k=192 l=224 m=256 n=384)
        b0 = c("Branch_0/Conv2d_1a_3x3", x, 384, 3, stride=2, padding="VALID")
        b1 = c("Branch_1/Conv2d_0a_1x1", x, 192, 1)
        b1 = c("Branch_1/Conv2d_0b_3x3", b1, 224, 3)
        b1 = c("Branch_1/Conv2d_1a_3x3", b1, 256, 3, stride=2, padding="VALID")
        x = jnp.concatenate([b0, b1, max_pool(x)], -1)  # 1024
    for i in range(7):
        x = _v4_block_b(x, pb, f"Mixed_6{'bcdefgh'[i]}")
    with pb.scope("Mixed_7a"):  # reduction B
        b0 = c("Branch_0/Conv2d_0a_1x1", x, 192, 1)
        b0 = c("Branch_0/Conv2d_1a_3x3", b0, 192, 3, stride=2, padding="VALID")
        b1 = c("Branch_1/Conv2d_0a_1x1", x, 256, 1)
        b1 = c("Branch_1/Conv2d_0b_1x7", b1, 256, 1, 7)
        b1 = c("Branch_1/Conv2d_0c_7x1", b1, 320, 7, 1)
        b1 = c("Branch_1/Conv2d_1a_3x3", b1, 320, 3, stride=2, padding="VALID")
        x = jnp.concatenate([b0, b1, max_pool(x)], -1)  # 1536
    for i in range(3):
        x = _v4_block_c(x, pb, f"Mixed_7{'bcd'[i]}")
    return x, x  # att tap == final net (nets/inception_v4.py:309-316)


# ==================================================== Inception-ResNet-V2


def _irv2_trunk(x, pb: ParamBuilder):
    c = pb.conv_bn
    x = c("Conv2d_1a_3x3", x, 32, 3, stride=2, padding="VALID")
    x = c("Conv2d_2a_3x3", x, 32, 3, padding="VALID")
    x = c("Conv2d_2b_3x3", x, 64, 3)
    x = max_pool(x)
    x = c("Conv2d_3b_1x1", x, 80, 1, padding="VALID")
    x = c("Conv2d_4a_3x3", x, 192, 3, padding="VALID")
    x = max_pool(x)

    with pb.scope("Mixed_5b"):
        b0 = c("Branch_0/Conv2d_1x1", x, 96, 1)
        b1 = c("Branch_1/Conv2d_0a_1x1", x, 48, 1)
        b1 = c("Branch_1/Conv2d_0b_5x5", b1, 64, 5)
        b2 = c("Branch_2/Conv2d_0a_1x1", x, 64, 1)
        b2 = c("Branch_2/Conv2d_0b_3x3", b2, 96, 3)
        b2 = c("Branch_2/Conv2d_0c_3x3", b2, 96, 3)
        b3 = c("Branch_3/Conv2d_0b_1x1", avg_pool(x), 64, 1)
        x = jnp.concatenate([b0, b1, b2, b3], -1)  # 320

    def block35(name, scale=0.17):
        nonlocal x
        with pb.scope(name):
            b0 = c("Branch_0/Conv2d_1x1", x, 32, 1)
            b1 = c("Branch_1/Conv2d_0a_1x1", x, 32, 1)
            b1 = c("Branch_1/Conv2d_0b_3x3", b1, 32, 3)
            b2 = c("Branch_2/Conv2d_0a_1x1", x, 32, 1)
            b2 = c("Branch_2/Conv2d_0b_3x3", b2, 48, 3)
            b2 = c("Branch_2/Conv2d_0c_3x3", b2, 64, 3)
            mixed = jnp.concatenate([b0, b1, b2], -1)
            up = c("Conv2d_1x1", mixed, x.shape[-1], 1, relu=False)
            x = jax.nn.relu(x + scale * up)

    for i in range(10):
        block35(f"Repeat/block35_{i+1}")

    with pb.scope("Mixed_6a"):
        b0 = c("Branch_0/Conv2d_1a_3x3", x, 384, 3, stride=2, padding="VALID")
        b1 = c("Branch_1/Conv2d_0a_1x1", x, 256, 1)
        b1 = c("Branch_1/Conv2d_0b_3x3", b1, 256, 3)
        b1 = c("Branch_1/Conv2d_1a_3x3", b1, 384, 3, stride=2, padding="VALID")
        x = jnp.concatenate([b0, b1, max_pool(x)], -1)  # 1088

    def block17(name, scale=0.10):
        nonlocal x
        with pb.scope(name):
            b0 = c("Branch_0/Conv2d_1x1", x, 192, 1)
            b1 = c("Branch_1/Conv2d_0a_1x1", x, 128, 1)
            b1 = c("Branch_1/Conv2d_0b_1x7", b1, 160, 1, 7)
            b1 = c("Branch_1/Conv2d_0c_7x1", b1, 192, 7, 1)
            mixed = jnp.concatenate([b0, b1], -1)
            up = c("Conv2d_1x1", mixed, x.shape[-1], 1, relu=False)
            x = jax.nn.relu(x + scale * up)

    for i in range(20):
        block17(f"Repeat_1/block17_{i+1}")

    with pb.scope("Mixed_7a"):
        b0 = c("Branch_0/Conv2d_0a_1x1", x, 256, 1)
        b0 = c("Branch_0/Conv2d_1a_3x3", b0, 384, 3, stride=2, padding="VALID")
        b1 = c("Branch_1/Conv2d_0a_1x1", x, 256, 1)
        b1 = c("Branch_1/Conv2d_1a_3x3", b1, 288, 3, stride=2, padding="VALID")
        b2 = c("Branch_2/Conv2d_0a_1x1", x, 256, 1)
        b2 = c("Branch_2/Conv2d_0b_3x3", b2, 288, 3)
        b2 = c("Branch_2/Conv2d_1a_3x3", b2, 320, 3, stride=2, padding="VALID")
        x = jnp.concatenate([b0, b1, b2, max_pool(x)], -1)  # 2080

    def block8(name, scale=0.20, relu=True):
        nonlocal x
        with pb.scope(name):
            b0 = c("Branch_0/Conv2d_1x1", x, 192, 1)
            b1 = c("Branch_1/Conv2d_0a_1x1", x, 192, 1)
            b1 = c("Branch_1/Conv2d_0b_1x3", b1, 224, 1, 3)
            b1 = c("Branch_1/Conv2d_0c_3x1", b1, 256, 3, 1)
            mixed = jnp.concatenate([b0, b1], -1)
            up = c("Conv2d_1x1", mixed, x.shape[-1], 1, relu=False)
            x = x + scale * up
            if relu:
                x = jax.nn.relu(x)

    for i in range(9):
        block8(f"Repeat_2/block8_{i+1}")
    block8("Block8", scale=1.0, relu=False)
    x = c("Conv2d_7b_1x1", x, 1536, 1)
    return x, x  # att tap == Conv2d_7b_1x1 (nets/inception_resnet_v2.py:254-255)


_TRUNKS = {
    "inception_v3": (_v3_trunk, 2048, 1280),
    "inception_v4": (_v4_trunk, 1536, 1536),
    "inception_resnet_v2": (_irv2_trunk, 1536, 1536),
}


def inception_init(arch: str, rng=None) -> Dict:
    """Build the flat param dict by tracing one 299x299 example."""
    trunk, _, _ = _TRUNKS[arch]
    pb = ParamBuilder(rng=rng)
    x = jnp.zeros((1, 299, 299, 3))
    with jax.ensure_compile_time_eval():
        trunk(_preprocess(x), pb)
    return pb.params


def inception_features(arch: str, params: Dict, images):
    """images (B, 299, 299, 3) in [0,1] -> (fc (B, fc_dim), att (B, 8, 8, att_dim))."""
    trunk, _, _ = _TRUNKS[arch]
    pb = ParamBuilder(params=params)
    att, final = trunk(_preprocess(images), pb)
    fc = jnp.mean(final, axis=(1, 2))
    return fc, att


def load_flat_npz(path: str) -> Dict:
    """Load a flat {name: array} npz produced offline from a TF-slim
    checkpoint (convert with TF elsewhere: slim var
    'InceptionV3/Mixed_5b/Branch_0/Conv2d_0a_1x1/weights' -> key
    'Mixed_5b/Branch_0/Conv2d_0a_1x1/w', BatchNorm beta/moving_mean/
    moving_variance -> bn/bias, bn/mean, bn/var; gamma fixed at 1 in slim's
    inception arg scope -> bn/scale of ones)."""
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}
