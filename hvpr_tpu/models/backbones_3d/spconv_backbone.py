"""SECOND-family 3D voxel backbones (dense NDHWC fallback).

Parity target: the reference registers spconv-based backbones that are absent
from its snapshot (backbones_3d/__init__.py:2-3 -> VoxelBackBone8x,
VoxelResBackBone8x, UNetV2; consumed by HeightCompression,
height_compression.py:20-25). They are NOT on the HVPR config path.

TPU note: true submanifold sparse convolution has no XLA primitive; this
fallback densifies the voxel grid and runs dense 3D convolutions (NDHWC),
which is exact for the same weights but only tractable for coarse grids
(e.g. <= ~64x512x512 cells). KITTI-SECOND's 0.05 m grid (41x1600x1408) should
use a pillar/BEV formulation instead; the registry entries exist for config
parity and small-grid use.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..model_utils.layers import MaskedBatchNorm


class Conv3DBNReLU(nn.Module):
    features: int
    stride: int = 1
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel,) * 3,
                    strides=(self.stride,) * 3,
                    padding=((pad, pad),) * 3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3)(x)
        return nn.relu(x)


def densify_voxels(batch_dict, grid_size):
    """Scatter per-voxel mean features into a dense (B, D, H, W, C) volume."""
    nx, ny, nz = (int(g) for g in grid_size)
    voxels = batch_dict['voxels']                          # (B, V, P, C)
    counts = jnp.clip(batch_dict['voxel_num_points'][..., None].astype(voxels.dtype), 1, None)
    feats = voxels.sum(axis=2) / counts                    # (B, V, C) mean VFE
    coords = batch_dict['voxel_coords']                    # (B, V, 3) zyx
    mask = batch_dict['voxel_mask']

    b, v, c = feats.shape
    flat = coords[..., 0] * (ny * nx) + coords[..., 1] * nx + coords[..., 2]
    flat = jnp.where(mask, flat, nz * ny * nx)

    def one(f, idx):
        canvas = jnp.zeros((nz * ny * nx + 1, c), dtype=f.dtype)
        return canvas.at[idx].set(f, mode='drop')[:nz * ny * nx]

    import jax
    dense = jax.vmap(one)(feats, flat)
    return dense.reshape(b, nz, ny, nx, c)


class VoxelBackBone8x(nn.Module):
    """4-stage 3D conv backbone, 8x downsample (channels 16-32-64-64)."""

    model_cfg: dict
    input_channels: int
    grid_size: Sequence[int] = None

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        grid = self.grid_size if self.grid_size is not None \
            else batch_dict['grid_size']
        x = densify_voxels(batch_dict, grid)
        x = Conv3DBNReLU(16)(x, train)
        x = Conv3DBNReLU(16)(x, train)
        x = Conv3DBNReLU(32, stride=2)(x, train)
        x = Conv3DBNReLU(32)(x, train)
        x = Conv3DBNReLU(64, stride=2)(x, train)
        x = Conv3DBNReLU(64)(x, train)
        x = Conv3DBNReLU(64, stride=2)(x, train)
        x = Conv3DBNReLU(64)(x, train)
        batch_dict['encoded_spconv_tensor'] = x
        batch_dict['encoded_spconv_tensor_stride'] = 8
        return batch_dict


class _ResBlock3D(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        out = Conv3DBNReLU(self.features)(x, train)
        out = nn.Conv(self.features, (3, 3, 3), padding=((1, 1),) * 3,
                      use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-3)(out)
        return nn.relu(out + x)


class VoxelResBackBone8x(nn.Module):
    """Residual variant of VoxelBackBone8x."""

    model_cfg: dict
    input_channels: int
    grid_size: Sequence[int] = None

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        grid = self.grid_size if self.grid_size is not None \
            else batch_dict['grid_size']
        x = densify_voxels(batch_dict, grid)
        x = Conv3DBNReLU(16)(x, train)
        x = _ResBlock3D(16)(x, train)
        x = Conv3DBNReLU(32, stride=2)(x, train)
        x = _ResBlock3D(32)(x, train)
        x = Conv3DBNReLU(64, stride=2)(x, train)
        x = _ResBlock3D(64)(x, train)
        x = Conv3DBNReLU(64, stride=2)(x, train)
        x = _ResBlock3D(64)(x, train)
        batch_dict['encoded_spconv_tensor'] = x
        batch_dict['encoded_spconv_tensor_stride'] = 8
        return batch_dict


class UNetV2(nn.Module):
    """Encoder-decoder over the dense voxel volume with skip connections.

    Produces per-voxel features at full resolution ('point_features' on the
    voxel grid) plus the 8x encoded volume, mirroring the role of the missing
    spconv_unet.py upstream.
    """

    model_cfg: dict
    input_channels: int
    grid_size: Sequence[int] = None

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        grid = self.grid_size if self.grid_size is not None \
            else batch_dict['grid_size']
        x0 = densify_voxels(batch_dict, grid)
        x0 = Conv3DBNReLU(16)(x0, train)
        x1 = Conv3DBNReLU(32, stride=2)(x0, train)
        x2 = Conv3DBNReLU(64, stride=2)(x1, train)
        x3 = Conv3DBNReLU(64, stride=2)(x2, train)

        def up(x, skip, ch):
            x = nn.ConvTranspose(ch, (2, 2, 2), strides=(2, 2, 2),
                                 padding='VALID', use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3)(x)
            # odd encoder dims ceil-halve under stride 2, so the doubled
            # upsample can exceed the skip by one cell per axis — crop to the
            # skip shape (standard U-Net alignment)
            x = x[:, :skip.shape[1], :skip.shape[2], :skip.shape[3]]
            return nn.relu(x) + skip

        u2 = up(x3, x2, 64)
        u1 = up(u2, x1, 32)
        u0 = up(u1, x0, 16)
        batch_dict['encoded_spconv_tensor'] = x3
        batch_dict['encoded_spconv_tensor_stride'] = 8
        batch_dict['voxel_unet_features'] = u0
        return batch_dict
