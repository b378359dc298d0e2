"""Pillar voxel-feature encoders (flax, fixed-shape, batched).

Parity target: /root/reference/pcdet/models/backbones_3d/vfe/pillar_vfe.py
(PFNLayer:8-49, PillarVFE:52-124, PillarVFE_Scale:127-221) and mean_vfe.py.

TPU-native design: the reference operates on a ragged (NV, P, C) voxel list;
here everything is a dense (B, V, P, C) tensor with validity masks, so the
PFN MLP is one large batched matmul on the MXU and the max-pool is a masked
reduction on the VPU. The reference's 50k-row chunking workaround
(pillar_vfe.py:29-36) is unnecessary under XLA.

Feature decoration (10 channels with the HVPR config): [x, y, z, intensity,
cluster-offset xyz, center-offset xyz], matching pillar_vfe.py:94-124.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....ops.scatter import (segment_broadcast_max_t, segment_last_row,
                             segment_sums_t)
from ....ops.segment_sweep import segment_sweep_pallas
from ...model_utils.layers import DenseT, MaskedBatchNorm


def _segment_max(x_t, safe_slot, max_seg, allow_pallas):
    """Dispatch: explicit-schedule Pallas sweep on TPU inference (batch-size
    independent — fixes the b8->b16 XLA fusion cliff, docs/DESIGN.md), XLA
    twin elsewhere and on the (differentiated) training path."""
    if allow_pallas and jax.default_backend() == 'tpu':
        return segment_sweep_pallas(x_t, safe_slot, max_seg, 'max')
    return segment_broadcast_max_t(x_t, safe_slot, max_seg)


def _segment_sums(x_t, safe_slot, max_seg, allow_pallas):
    if allow_pallas and jax.default_backend() == 'tpu':
        return segment_sweep_pallas(x_t, safe_slot, max_seg, 'sum')
    return segment_sums_t(x_t, safe_slot, max_seg)


class PFNLayer(nn.Module):
    """Linear -> (masked) BN -> ReLU -> max-pool over points-in-pillar.

    Two input layouts share the same parameters (checkpoint-compatible):
      * padded: inputs (B, V, P, C) + point_mask (B, V, P);
      * flat (channel-major): inputs (C, R) + point_mask (R,) + safe_slot
        (R,) sentinel-carrying slot ids — the max-pool is a gather-free
        doubling-scan broadcast (ops/scatter.segment_broadcast_max_t), and
        every op is lane-aligned along the long row axis (a row-major
        (R, <=64) layout tile-pads the minor dim to 128 lanes: up to 12.8x
        HBM waste, ~25 ms per batch, measured).
    """

    out_channels: int
    use_norm: bool = True
    last_layer: bool = False
    max_seg: int = 32           # longest valid-row prefix per pillar segment

    @nn.compact
    def __call__(self, inputs, point_mask, train: bool,
                 flat_slot=None, num_slots=None):
        out_ch = self.out_channels if self.last_layer else self.out_channels // 2

        if flat_slot is not None:
            # channel-major flat path: inputs (C_in, R), flat_slot = safe slot
            x = DenseT(out_ch, use_bias=not self.use_norm,
                       name='Dense_0')(inputs)                # (out, R)
            if self.use_norm:
                x = MaskedBatchNorm()(x, point_mask, train, transposed=True)
            x = nn.relu(x)
            xm = jnp.where(point_mask[None, :], x, -1e9)
            seg = _segment_max(xm, flat_slot, self.max_seg,
                               allow_pallas=not train)
            seg = jnp.where(point_mask[None, :], seg, 0.0)
            if self.last_layer:
                return seg
            x = jnp.where(point_mask[None, :], x, 0.0)
            return jnp.concatenate([x, seg], axis=0)          # (2*out, R)

        x = nn.Dense(out_ch, use_bias=not self.use_norm)(inputs)
        if self.use_norm:
            x = MaskedBatchNorm()(x, point_mask, train)
        x = nn.relu(x)
        x = jnp.where(point_mask[..., None], x, -1e9)
        x_max = x.max(axis=2, keepdims=True)               # (B, V, 1, C)
        x_max = jnp.where(x_max > -1e8, x_max, 0.0)        # fully-empty pillars -> 0
        if self.last_layer:
            return x_max.squeeze(2)                         # (B, V, C)
        x = jnp.where(point_mask[..., None], x, 0.0)
        x_repeat = jnp.broadcast_to(x_max, x.shape)
        return jnp.concatenate([x, x_repeat], axis=-1)


def decorate_pillar_features(voxels, num_points, coords, voxel_size, point_cloud_range,
                             use_absolute_xyz=True, with_distance=False):
    """Build the 10-channel decorated point features + the point validity mask.

    Args:
        voxels: (B, V, P, C_in) raw per-point features (xyz + extras).
        num_points: (B, V) int points per pillar.
        coords: (B, V, 3) int (z, y, x) grid coords.
    Returns:
        features (B, V, P, C_dec), point_mask (B, V, P), points_mean (B, V, 3)
    """
    vx, vy, vz = voxel_size
    x0, y0, z0 = point_cloud_range[0:3]

    counts = jnp.clip(num_points[..., None, None].astype(voxels.dtype), 1.0, None)
    points_mean = voxels[..., :3].sum(axis=2, keepdims=True) / counts   # (B, V, 1, 3)
    f_cluster = voxels[..., :3] - points_mean

    cx = coords[..., 2:3].astype(voxels.dtype) * vx + (vx / 2 + x0)      # (B, V, 1)
    cy = coords[..., 1:2].astype(voxels.dtype) * vy + (vy / 2 + y0)
    cz = coords[..., 0:1].astype(voxels.dtype) * vz + (vz / 2 + z0)
    center = jnp.stack([cx, cy, cz], axis=-1)                            # (B, V, 1, 3)
    f_center = voxels[..., :3] - center

    parts = [voxels if use_absolute_xyz else voxels[..., 3:], f_cluster, f_center]
    if with_distance:
        parts.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
    features = jnp.concatenate(parts, axis=-1)

    p = voxels.shape[2]
    point_mask = jnp.arange(p)[None, None, :] < num_points[..., None]    # (B, V, P)
    features = features * point_mask[..., None]
    return features, point_mask, points_mean.squeeze(2)


def decorate_flat_features(batch_dict, voxel_size, point_cloud_range,
                           use_absolute_xyz=True, with_distance=False,
                           max_seg=32, allow_pallas=False):
    """Flat-layout decoration, channel-major: (C_dec, R) rows.

    Consumes voxelize_batch_flat outputs (flat_points (C, R) / flat_slot /
    flat_write + counts). Gather-free: per-row pillar means come from two
    doubling-scan sweeps (ops/scatter.segment_sums_t) and the pillar center
    is recomputed from the point's own grid cell (the identical floor() the
    voxelizer used) instead of a coords gather-back.

    Returns:
        features_t (C_dec, R), safe_slot (R,) sentinel-carrying slot ids,
        sums_t (3, R) per-row full xyz segment sums (for the scale stream).
    """
    pts_t = batch_dict['flat_points']                # (C_raw, R)
    slot = batch_dict['flat_slot']                   # (R,)
    write = batch_dict['flat_write']                 # (R,)
    counts = batch_dict['voxel_num_points']          # (B, V)
    b, v = counts.shape
    num_slots = b * v

    vsz = jnp.asarray(voxel_size, dtype=pts_t.dtype)[:, None]       # (3, 1)
    origin = jnp.asarray(point_cloud_range[0:3], dtype=pts_t.dtype)[:, None]

    safe_slot = jnp.where(write, slot, num_slots)
    xyz_t = pts_t[:3]
    # one fused (4, R) sweep: xyz sums + per-row segment count
    stacked = jnp.concatenate(
        [jnp.where(write[None, :], xyz_t, 0.0),
         write[None, :].astype(pts_t.dtype)], axis=0)
    sums4 = _segment_sums(stacked, safe_slot, max_seg, allow_pallas)
    sums_t, cnt_row = sums4[:3], sums4[3:4]
    means_t = sums_t / jnp.clip(cnt_row, 1.0, None)                 # (3, R)
    f_cluster = xyz_t - means_t

    cell = jnp.floor((xyz_t - origin) / vsz)
    f_center = xyz_t - (cell * vsz + vsz / 2 + origin)

    parts = [pts_t if use_absolute_xyz else pts_t[3:], f_cluster, f_center]
    if with_distance:
        parts.append(jnp.linalg.norm(xyz_t, axis=0, keepdims=True))
    features_t = jnp.concatenate(parts, axis=0) * write[None, :]
    return features_t, safe_slot, sums_t


class PillarVFE(nn.Module):
    """Stacked PFN layers over decorated pillar point features."""

    model_cfg: dict
    num_point_features: int
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    max_points_per_voxel: int = 32

    def get_output_feature_dim(self):
        return list(self.model_cfg['NUM_FILTERS'])[-1]

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        num_filters = list(self.model_cfg['NUM_FILTERS'])
        use_norm = self.model_cfg.get('USE_NORM', True)

        if 'flat_points' in batch_dict:
            features_t, safe_slot, _ = decorate_flat_features(
                batch_dict, self.voxel_size, self.point_cloud_range,
                use_absolute_xyz=self.model_cfg.get('USE_ABSLOTE_XYZ', True),
                with_distance=self.model_cfg.get('WITH_DISTANCE', False),
                max_seg=self.max_points_per_voxel, allow_pallas=not train)
            b, v = batch_dict['voxel_num_points'].shape
            write = batch_dict['flat_write']
            for i, out_ch in enumerate(num_filters):
                features_t = PFNLayer(out_ch, use_norm,
                                      last_layer=(i == len(num_filters) - 1),
                                      max_seg=self.max_points_per_voxel)(
                    features_t, write, train,
                    flat_slot=safe_slot, num_slots=b * v)
            # one lane gather extracts each slot's (broadcast) max
            last = segment_last_row(safe_slot, b * v)
            cols = features_t[:, jnp.clip(last, 0, None)]
            cols = jnp.where((last >= 0)[None, :], cols, 0.0)
            features = cols.T.reshape(b, v, -1)
        else:
            features, point_mask, _ = decorate_pillar_features(
                batch_dict['voxels'], batch_dict['voxel_num_points'],
                batch_dict['voxel_coords'],
                self.voxel_size, self.point_cloud_range,
                use_absolute_xyz=self.model_cfg.get('USE_ABSLOTE_XYZ', True),
                with_distance=self.model_cfg.get('WITH_DISTANCE', False))
            for i, out_ch in enumerate(num_filters):
                features = PFNLayer(out_ch, use_norm,
                                    last_layer=(i == len(num_filters) - 1))(
                    features, point_mask, train)
            batch_dict['pillar_point_mask'] = point_mask

        batch_dict['pillar_features'] = features                      # (B, V, C)
        return batch_dict


class PillarVFE_Scale(nn.Module):
    """PillarVFE plus a scale-feature MLP over (count, |mean|, mean-xyz).

    The scale stream (pillar_vfe.py:155-169, 212-216) feeds the CBAM gating in
    the scale-aware BEV backbone.
    """

    model_cfg: dict
    num_point_features: int
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    max_points_per_voxel: int = 32

    def get_output_feature_dim(self):
        return list(self.model_cfg['NUM_FILTERS'])[-1]

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        num_filters = list(self.model_cfg['NUM_FILTERS'])
        use_norm = self.model_cfg.get('USE_NORM', True)

        if 'flat_points' in batch_dict:
            # flat path (device voxelization, no (B, V, P, C) materialization)
            features_t, safe_slot, sums_t = decorate_flat_features(
                batch_dict, self.voxel_size, self.point_cloud_range,
                use_absolute_xyz=self.model_cfg.get('USE_ABSLOTE_XYZ', True),
                with_distance=self.model_cfg.get('WITH_DISTANCE', False),
                max_seg=self.max_points_per_voxel, allow_pallas=not train)
            b, v = batch_dict['voxel_num_points'].shape
            write = batch_dict['flat_write']
            for i, out_ch in enumerate(num_filters):
                features_t = PFNLayer(out_ch, use_norm,
                                      last_layer=(i == len(num_filters) - 1),
                                      max_seg=self.max_points_per_voxel)(
                    features_t, write, train,
                    flat_slot=safe_slot, num_slots=b * v)
            # ONE lane gather extracts pillar features AND xyz sums per slot
            last = segment_last_row(safe_slot, b * v)
            src = jnp.concatenate([features_t, sums_t], axis=0)
            cols = src[:, jnp.clip(last, 0, None)]
            cols = jnp.where((last >= 0)[None, :], cols, 0.0)
            features = cols[:-3].T.reshape(b, v, -1)
            cnt = jnp.clip(
                batch_dict['voxel_num_points'].reshape(1, -1).astype(
                    cols.dtype), 1.0, None)
            points_mean = (cols[-3:] / cnt).T.reshape(b, v, 3)
        else:
            features, point_mask, points_mean = decorate_pillar_features(
                batch_dict['voxels'], batch_dict['voxel_num_points'],
                batch_dict['voxel_coords'],
                self.voxel_size, self.point_cloud_range,
                use_absolute_xyz=self.model_cfg.get('USE_ABSLOTE_XYZ', True),
                with_distance=self.model_cfg.get('WITH_DISTANCE', False))
            for i, out_ch in enumerate(num_filters):
                features = PFNLayer(out_ch, use_norm,
                                    last_layer=(i == len(num_filters) - 1))(
                    features, point_mask, train)
            batch_dict['pillar_point_mask'] = point_mask

        # scale stream: (num_points, ||mean||, mean_xyz) -> MLP,
        # channel-major (C, B*V): 5-wide rows would tile-pad to 128 lanes
        voxel_mask = batch_dict['voxel_num_points'].reshape(-1) > 0
        b, v = batch_dict['voxel_num_points'].shape
        means_t = points_mean.reshape(-1, 3).T                          # (3, B*V)
        d_mean = jnp.linalg.norm(means_t, axis=0, keepdims=True)        # (1, B*V)
        scale_t = jnp.concatenate([
            batch_dict['voxel_num_points'].reshape(1, -1).astype(features.dtype),
            d_mean, means_t], axis=0)                                   # (5, B*V)
        for i, out_ch in enumerate(list(self.model_cfg['NUM_SCALE_FEATURES'])):
            scale_t = DenseT(out_ch, use_bias=False,
                             name=f'Dense_{i}')(scale_t)
            scale_t = MaskedBatchNorm()(scale_t, voxel_mask, train,
                                        transposed=True)
            scale_t = nn.relu(scale_t)
        scale = scale_t.T.reshape(b, v, -1)

        batch_dict['pillar_features'] = features
        batch_dict['pillar_scale_features'] = scale
        return batch_dict


class MeanVFE(nn.Module):
    """Per-voxel mean of raw point features (mean_vfe.py:14-31)."""

    model_cfg: dict
    num_point_features: int
    voxel_size: Sequence[float] = None
    point_cloud_range: Sequence[float] = None
    max_points_per_voxel: int = 32

    def get_output_feature_dim(self):
        return self.num_point_features

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        voxels = batch_dict['voxels']
        counts = jnp.clip(batch_dict['voxel_num_points'][..., None].astype(voxels.dtype), 1.0, None)
        batch_dict['pillar_features'] = voxels.sum(axis=2) / counts
        return batch_dict
