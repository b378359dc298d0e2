"""CBAM spatial attention gate (flax, NHWC).

Parity target: /root/reference/pcdet/models/backbones_2d/spatial_attention.py
(ChannelPool max||mean:47-49; SpatialAttention: pool the *scale* map, 3x3
conv+BN, sigmoid gate multiplying x:51-63).
"""

import flax.linen as nn
import jax.numpy as jnp


def channel_pool(x):
    """(B, H, W, C) -> (B, H, W, 2): channelwise [max, mean]."""
    return jnp.concatenate([x.max(axis=-1, keepdims=True),
                            x.mean(axis=-1, keepdims=True)], axis=-1)


class SpatialAttention(nn.Module):
    """sigmoid(conv3x3(BN(channel_pool(w)))) * x — gate x by the scale map w."""

    @nn.compact
    def __call__(self, x, w, train: bool):
        att = channel_pool(w)
        att = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), use_bias=True)(att)
        att = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3)(att)
        att = nn.sigmoid(att)
        return att * x
