"""SECOND-family 3D backbone on TRUE sparse convolutions (active sites only).

Replaces the spconv ``VoxelBackBone8x`` the reference imports but does not
ship (backbones_3d/__init__.py:2-3; external spconv dep, setup.py:41) with
the gather/searchsorted sparse conv ops of :mod:`hvpr_tpu.ops.sparse_conv`.
Usable at KITTI-SECOND resolution (41 x 1600 x 1408) where the dense NDHWC
fallback (spconv_backbone.py) is intractable: compute scales with the
~16k active sites, not the 92M-cell grid.

Structure follows OpenPCDet's VoxelBackBone8x: a SubM stem, then three
(strided sparse conv + 2 SubM) stages to stride 8, channels 16-32-64-64,
closed by the upstream ``conv_out``: a (3,1,1)-kernel, (2,1,1)-stride,
padding-0 sparse conv that compresses the z axis before densification.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.sparse_conv import (sparse_conv3d, sparse_conv3d_out_grid,
                                subm_conv3d)
from ..model_utils.layers import MaskedBatchNorm


class SubMBlock(nn.Module):
    """Submanifold conv + masked BN + ReLU on an active-site list."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, feats, coords, valid, grid, train: bool):
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (self.kernel ** 3, feats.shape[-1], self.features))
        x = subm_conv3d(feats, coords, valid, w, grid)
        x = MaskedBatchNorm()(x, valid, train)
        return nn.relu(x)


class SparseDownBlock(nn.Module):
    """Strided sparse conv (new site list) + masked BN + ReLU.

    Per-axis kernel/stride/padding: the stage convs are (3,3,3)/s2/p1, the
    final conv_out is (3,1,1)/(2,1,1)/p0 as in upstream VoxelBackBone8x.
    """

    features: int
    max_out: int
    kernel: tuple = (3, 3, 3)
    stride: tuple = (2, 2, 2)
    padding: tuple = (1, 1, 1)

    @nn.compact
    def __call__(self, feats, coords, valid, grid, train: bool):
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (int(np.prod(self.kernel)), feats.shape[-1],
                        self.features))
        x, c, m, dropped = sparse_conv3d(
            feats, coords, valid, w, grid, kernel=self.kernel,
            stride=self.stride, padding=self.padding, max_out=self.max_out)
        x = MaskedBatchNorm()(x, m, train)
        return nn.relu(x), c, m, dropped


def _sites_from_batch(batch_dict, grid):
    """Active sites (feats, coords, valid) sorted by linear cell id."""
    if 'pillar_features' in batch_dict:
        feats = batch_dict['pillar_features']               # (B, V, C) via VFE
    else:
        voxels = batch_dict['voxels']
        cnt = jnp.clip(batch_dict['voxel_num_points'][..., None].astype(
            voxels.dtype), 1, None)
        feats = voxels.sum(axis=2) / cnt
    coords = batch_dict['voxel_coords']
    valid = batch_dict['voxel_mask']

    nz, ny, nx = grid
    lin = coords[..., 0] * (ny * nx) + coords[..., 1] * nx + coords[..., 2]
    lin = jnp.where(valid, lin, nz * ny * nx)
    order = jnp.argsort(lin, axis=1)
    take = lambda a: jnp.take_along_axis(
        a, order.reshape(*order.shape, *([1] * (a.ndim - 2))), axis=1)
    return take(feats), take(coords), jnp.take_along_axis(valid, order, axis=1)


class VoxelBackBone8xSparse(nn.Module):
    """Sparse 8x voxel encoder -> dense (B, D/8, H/8, W/8, C) volume."""

    model_cfg: dict
    input_channels: int
    grid_size: Sequence[int] = None       # (nx, ny, nz)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        nx, ny, nz = (int(g) for g in (
            self.grid_size if self.grid_size is not None
            else batch_dict['grid_size']))
        grid = (nz, ny, nx)
        f, c, m = _sites_from_batch(batch_dict, grid)
        v = f.shape[1]
        # a stride-2 sparse conv DILATES the active set (each input touches
        # up to 8 decimated cells) — 2*V covers sparse far-range scans;
        # overflow is counted into batch_dict (never silent)
        cap = int(self.model_cfg.get('MAX_SITES', 2 * v))

        f = SubMBlock(16)(f, c, m, grid, train)
        f = SubMBlock(16)(f, c, m, grid, train)

        total_dropped = jnp.zeros((f.shape[0],), jnp.int32)
        channels = list(self.model_cfg.get('NUM_FILTERS', [32, 64, 64]))
        for ch in channels:
            f, c, m, dropped = SparseDownBlock(ch, max_out=cap)(
                f, c, m, grid, train)
            total_dropped = total_dropped + dropped
            grid = sparse_conv3d_out_grid(grid, 3, 2, 1)
            f = SubMBlock(ch)(f, c, m, grid, train)
            f = SubMBlock(ch)(f, c, m, grid, train)

        # upstream conv_out: (3,1,1) kernel, (2,1,1) stride, no padding —
        # halves z only, output stride stays 8 in BEV
        out_ch = int(self.model_cfg.get('OUT_CHANNELS', 128))
        f, c, m, dropped = SparseDownBlock(
            out_ch, max_out=cap, kernel=(3, 1, 1), stride=(2, 1, 1),
            padding=(0, 0, 0))(f, c, m, grid, train)
        total_dropped = total_dropped + dropped
        grid = sparse_conv3d_out_grid(grid, (3, 1, 1), (2, 1, 1), (0, 0, 0))
        batch_dict['sparse_sites_dropped'] = total_dropped

        # densify the z-compressed stride-8 sites for HeightCompression
        dz, dy, dx = grid
        lin = c[..., 0] * (dy * dx) + c[..., 1] * dx + c[..., 2]
        lin = jnp.where(m, lin, dz * dy * dx)

        def one(feat, idx):
            rowid = jnp.full((dz * dy * dx + 1,), feat.shape[0], jnp.int32)
            rowid = rowid.at[idx].set(
                jnp.arange(feat.shape[0], dtype=jnp.int32),
                mode='drop')[:dz * dy * dx]
            ext = jnp.concatenate(
                [feat, jnp.zeros((1, feat.shape[1]), feat.dtype)], 0)
            return ext[rowid]

        dense = jax.vmap(one)(f, lin).reshape(f.shape[0], dz, dy, dx, out_ch)
        batch_dict['encoded_spconv_tensor'] = dense
        batch_dict['encoded_spconv_tensor_stride'] = 8
        return batch_dict
