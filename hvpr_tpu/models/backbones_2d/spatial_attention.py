"""CBAM spatial attention gate (flax, NHWC).

Parity target: /root/reference/pcdet/models/backbones_2d/spatial_attention.py
(ChannelPool max||mean:47-49; SpatialAttention: pool the *scale* map, 3x3
conv+BN, sigmoid gate multiplying x:51-63).
"""

import flax.linen as nn
import jax.numpy as jnp

from ..model_utils.layers import SplitBatchNorm


def channel_pool(x):
    """(B, H, W, C) -> (B, H, W, 2): channelwise [max, mean]."""
    return jnp.concatenate([x.max(axis=-1, keepdims=True),
                            x.mean(axis=-1, keepdims=True)], axis=-1)


class SpatialAttention(nn.Module):
    """sigmoid(conv3x3(BN(channel_pool(w)))) * x — gate x by the scale map w.

    ``splits``: per-split BN statistics when the caller stacks the dual
    train pass along the batch axis (w tiled per split) — see
    model_utils.layers.SplitBatchNorm.
    """

    @nn.compact
    def __call__(self, x, w, train: bool, splits: int = 1):
        att = channel_pool(w)
        att = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), use_bias=True)(att)
        att = SplitBatchNorm(momentum=0.99, epsilon=1e-3,
                             name='BatchNorm_0')(att, train, splits=splits)
        att = nn.sigmoid(att)
        return att * x
