"""InceptionV3 (Flax linen, NHWC) — the FID feature extractor.

torchvision-layout ``inception_v3`` (transform_input=False, aux logits
off) so the reference's FID protocol ports exactly: with the final fc
removed the network emits 2048-d pool features at 299x299
(ref: fid_fast.py:11-13,23-28).  BasicConv2d = conv(bias-free) +
BN(eps=1e-3) + ReLU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["InceptionV3", "inception_v3"]


class _BasicConv(nn.Module):
    out_ch: int
    kernel: tuple
    stride: int = 1
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, self.kernel, strides=self.stride,
                    padding=(self.padding if isinstance(self.padding[0], tuple)
                             else tuple((p, p) for p in self.padding)),
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _pool3_same(x):
    # torchvision's branch_pool is F.avg_pool2d(x, 3, 1, 1) with the
    # DEFAULT count_include_pad=True (always divide by 9) — the FID
    # protocol (fid_fast.py:11-13) uses stock torchvision inception, not
    # pytorch-fid's corrected-avg-pool variant.
    return nn.avg_pool(x, (3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)), count_include_pad=True)


def _maxpool3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class _InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = _BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = _BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = _BasicConv(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = _BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = _BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = _BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _BasicConv(self.pool_features, (1, 1),
                        name="branch_pool")(_pool3_same(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class _InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _BasicConv(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = _BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = _BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = _BasicConv(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool3_s2(x)], axis=-1)


class _InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = _BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = _BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = _BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = _BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = _BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = _BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = _BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = _BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = _BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _BasicConv(192, (1, 1), name="branch_pool")(_pool3_same(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class _InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = _BasicConv(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = _BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = _BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = _BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = _BasicConv(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool3_s2(x)], axis=-1)


class _InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = _BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = _BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            _BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = _BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = _BasicConv(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            _BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = _BasicConv(192, (1, 1), name="branch_pool")(_pool3_same(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: jax.Array, return_features: bool = False):
        h = _BasicConv(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        h = _BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(h)
        h = _BasicConv(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(h)
        h = _maxpool3_s2(h)
        h = _BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(h)
        h = _BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(h)
        h = _maxpool3_s2(h)
        h = _InceptionA(32, name="Mixed_5b")(h)
        h = _InceptionA(64, name="Mixed_5c")(h)
        h = _InceptionA(64, name="Mixed_5d")(h)
        h = _InceptionB(name="Mixed_6a")(h)
        h = _InceptionC(128, name="Mixed_6b")(h)
        h = _InceptionC(160, name="Mixed_6c")(h)
        h = _InceptionC(160, name="Mixed_6d")(h)
        h = _InceptionC(192, name="Mixed_6e")(h)
        h = _InceptionD(name="Mixed_7a")(h)
        h = _InceptionE(name="Mixed_7b")(h)
        h = _InceptionE(name="Mixed_7c")(h)
        pooled = h.mean(axis=(1, 2))  # 2048-d FID features
        if return_features:
            return pooled
        return nn.Dense(self.num_classes, name="fc")(pooled)


def inception_v3(num_classes: int = 1000) -> InceptionV3:
    return InceptionV3(num_classes=num_classes)
