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
import jax.numpy as jnp

from ....ops.scatter import sorted_segment_max
from ...model_utils.layers import MaskedBatchNorm


class PFNLayer(nn.Module):
    """Linear -> (masked) BN -> ReLU -> max-pool over points-in-pillar.

    Two input layouts share the same parameters:
      * padded: inputs (B, V, P, C) + point_mask (B, V, P),
      * flat: inputs (R, C) + point_mask (R,) + flat_slot (R,) pillar-slot ids
        + num_slots — the max-pool becomes a small scatter-max over slots.
    """

    out_channels: int
    use_norm: bool = True
    last_layer: bool = False

    @nn.compact
    def __call__(self, inputs, point_mask, train: bool,
                 flat_slot=None, num_slots=None):
        out_ch = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(out_ch, use_bias=not self.use_norm)(inputs)
        if self.use_norm:
            x = MaskedBatchNorm()(x, point_mask, train)
        x = nn.relu(x)

        if flat_slot is not None:
            # sorted-prefix segmented max (see ops/scatter.py) — the direct
            # XLA scatter-max here cost ~10 ms per layer at batch 16
            seg = sorted_segment_max(x, flat_slot, point_mask, num_slots)
            if self.last_layer:
                return seg                                   # (num_slots, C)
            x = jnp.where(point_mask[..., None], x, 0.0)
            return jnp.concatenate([x, seg[jnp.clip(flat_slot, 0, num_slots - 1)]],
                                   axis=-1)

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
                           use_absolute_xyz=True, with_distance=False):
    """Flat-layout decoration: per-point rows (R, C_dec) + pillar means.

    Consumes voxelize_batch_flat outputs (flat_points/flat_slot/flat_write +
    counts/coords); no (B, V, P, C) tensor is ever built.
    """
    pts = batch_dict['flat_points']                  # (R, C_raw)
    slot = batch_dict['flat_slot']                   # (R,)
    write = batch_dict['flat_write']                 # (R,)
    counts = batch_dict['voxel_num_points']          # (B, V)
    coords = batch_dict['voxel_coords']              # (B, V, 3)
    b, v = counts.shape
    num_slots = b * v

    vx, vy, vz = voxel_size
    x0, y0, z0 = point_cloud_range[0:3]

    safe_slot = jnp.where(write, slot, num_slots)
    sums = jnp.zeros((num_slots + 1, 3), dtype=pts.dtype)
    sums = sums.at[safe_slot].add(pts[:, :3] * write[:, None], mode='drop')[:num_slots]
    cnt = jnp.clip(counts.reshape(-1, 1).astype(pts.dtype), 1.0, None)
    means = sums / cnt                               # (B*V, 3)

    gslot = jnp.clip(slot, 0, num_slots - 1)
    f_cluster = pts[:, :3] - means[gslot]

    coords_flat = coords.reshape(-1, 3)
    center = jnp.stack([
        coords_flat[gslot, 2].astype(pts.dtype) * vx + (vx / 2 + x0),
        coords_flat[gslot, 1].astype(pts.dtype) * vy + (vy / 2 + y0),
        coords_flat[gslot, 0].astype(pts.dtype) * vz + (vz / 2 + z0),
    ], axis=-1)
    f_center = pts[:, :3] - center

    parts = [pts if use_absolute_xyz else pts[:, 3:], f_cluster, f_center]
    if with_distance:
        parts.append(jnp.linalg.norm(pts[:, :3], axis=-1, keepdims=True))
    features = jnp.concatenate(parts, axis=-1) * write[:, None]
    return features, means.reshape(b, v, 3)


class PillarVFE(nn.Module):
    """Stacked PFN layers over decorated pillar point features."""

    model_cfg: dict
    num_point_features: int
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]

    def get_output_feature_dim(self):
        return list(self.model_cfg['NUM_FILTERS'])[-1]

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        num_filters = list(self.model_cfg['NUM_FILTERS'])
        use_norm = self.model_cfg.get('USE_NORM', True)

        if 'flat_points' in batch_dict:
            features, _ = decorate_flat_features(
                batch_dict, self.voxel_size, self.point_cloud_range,
                use_absolute_xyz=self.model_cfg.get('USE_ABSLOTE_XYZ', True),
                with_distance=self.model_cfg.get('WITH_DISTANCE', False))
            b, v = batch_dict['voxel_num_points'].shape
            write = batch_dict['flat_write']
            for i, out_ch in enumerate(num_filters):
                features = PFNLayer(out_ch, use_norm,
                                    last_layer=(i == len(num_filters) - 1))(
                    features, write, train,
                    flat_slot=batch_dict['flat_slot'], num_slots=b * v)
            features = features.reshape(b, v, -1)
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

    def get_output_feature_dim(self):
        return list(self.model_cfg['NUM_FILTERS'])[-1]

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        num_filters = list(self.model_cfg['NUM_FILTERS'])
        use_norm = self.model_cfg.get('USE_NORM', True)

        if 'flat_points' in batch_dict:
            # flat path (device voxelization, no (B, V, P, C) materialization)
            features, points_mean = decorate_flat_features(
                batch_dict, self.voxel_size, self.point_cloud_range,
                use_absolute_xyz=self.model_cfg.get('USE_ABSLOTE_XYZ', True),
                with_distance=self.model_cfg.get('WITH_DISTANCE', False))
            b, v = batch_dict['voxel_num_points'].shape
            write = batch_dict['flat_write']
            for i, out_ch in enumerate(num_filters):
                features = PFNLayer(out_ch, use_norm,
                                    last_layer=(i == len(num_filters) - 1))(
                    features, write, train,
                    flat_slot=batch_dict['flat_slot'], num_slots=b * v)
            features = features.reshape(b, v, -1)
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

        # scale stream: (num_points, ||mean||, mean_xyz) -> MLP
        voxel_mask = batch_dict['voxel_num_points'] > 0
        d_mean = jnp.linalg.norm(points_mean, axis=-1, keepdims=True)   # (B, V, 1)
        scale = jnp.concatenate([
            batch_dict['voxel_num_points'][..., None].astype(features.dtype),
            d_mean, points_mean], axis=-1)                              # (B, V, 5)
        for out_ch in list(self.model_cfg['NUM_SCALE_FEATURES']):
            scale = nn.Dense(out_ch, use_bias=False)(scale)
            scale = MaskedBatchNorm()(scale, voxel_mask, train)
            scale = nn.relu(scale)

        batch_dict['pillar_features'] = features
        batch_dict['pillar_scale_features'] = scale
        return batch_dict


class MeanVFE(nn.Module):
    """Per-voxel mean of raw point features (mean_vfe.py:14-31)."""

    model_cfg: dict
    num_point_features: int
    voxel_size: Sequence[float] = None
    point_cloud_range: Sequence[float] = None

    def get_output_feature_dim(self):
        return self.num_point_features

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        voxels = batch_dict['voxels']
        counts = jnp.clip(batch_dict['voxel_num_points'][..., None].astype(voxels.dtype), 1.0, None)
        batch_dict['pillar_features'] = voxels.sum(axis=2) / counts
        return batch_dict
