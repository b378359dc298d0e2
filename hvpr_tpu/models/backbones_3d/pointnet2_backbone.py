"""PointNet++ MSG point-stream backbone (flax, fixed-shape, batched).

Parity target: /root/reference/pcdet/models/backbones_3d/pointnet2_backbone.py
(PointNet2MSG:9-95 — SA(MSG) stack + FP upsampling back to all N points ->
point_features (N, 64); channel wiring per hvpr.yaml:59-67) built on the CUDA
ops the snapshot lacks (SURVEY.md §2b N3).

TPU-native: FPS/ball-query/grouping/3-NN come from ops/pointnet2.py as
fixed-shape masked JAX ops; batching is dense (B, N, C) tensors, so each SA
level's shared MLP is one large MXU matmul over (B, S, nsample, C). This
module runs only in training (the HVPR detector skips it at inference,
detectors/pointpillar.py:54-55).
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pointnet2 as pn2
from ..model_utils.layers import DenseT, MaskedBatchNorm


def _dtype_of(name):
    return jnp.bfloat16 if str(name).lower() in ('bf16', 'bfloat16') \
        else jnp.float32


class SharedMLP(nn.Module):
    """Per-point MLP (Dense + masked BN + ReLU stack).

    Runs channel-major internally ((C, R) with R = all flattened rows): the
    small channel dims (C <= 67 through the MSG stacks) would tile-pad the
    128-lane axis ~2x in row-major layout; transposing once at entry/exit
    puts the ~500k-row axis on the lanes instead — the same layout fix the
    flat VFE uses. Parameters are nn.Dense/row-major compatible (DenseT
    shares the 'Dense_i' checkpoint slots).

    ``compute_dtype=bf16`` halves the activation traffic of the stack — the
    train-time point stream is ~95% HBM-bound (TRAIN_PROFILE.json), so byte
    count IS its cost. Params and BN statistics stay f32 (MaskedBatchNorm
    accumulates stats in f32 regardless of the activation dtype).
    """

    channels: Sequence[int]
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        lead = x.shape[:-1]
        x_t = x.reshape(-1, x.shape[-1]).T.astype(self.compute_dtype)  # (C, R)
        m = mask.reshape(-1)
        for i, ch in enumerate(self.channels):
            x_t = DenseT(ch, name=f'Dense_{i}')(x_t)
            x_t = MaskedBatchNorm(name=f'MaskedBatchNorm_{i}')(
                x_t, m, train, transposed=True)
            x_t = nn.relu(x_t)
        return x_t.T.reshape(*lead, self.channels[-1])


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction level."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    fps_chunks: int = 1
    ball_query_semantics: str = 'auto'
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, mask, train: bool):
        """
        Args:
            xyz: (B, N, 3); features: (B, N, C) or None; mask: (B, N).
        Returns:
            new_xyz (B, S, 3), new_features (B, S, sum(mlp[-1])), new_mask (B, S).
        """
        idx = pn2.furthest_point_sample(xyz, mask, self.npoint,
                                        num_chunks=self.fps_chunks)   # (B, S)
        new_xyz = pn2.group_points(xyz, idx)                          # (B, S, 3)
        new_mask = jnp.take_along_axis(mask, idx, axis=1)             # (B, S)

        # ONE gather per scale over a combined [xyz | features] source: the
        # neighbor gather is the HBM-bound cost of the SA level (random row
        # access; measured ~3 ms per 4096x32 gather at flagship shapes), and
        # wider rows amortize the per-row transaction — two narrow gathers
        # cost ~2x one wide gather for the same payload.
        # Absolute xyz stays f32 through the gather (bf16 ulp at |x|~47 m is
        # ~0.125 m); the RELATIVE offsets after centering are radius-bounded,
        # so casting THEM to the compute dtype is safe.
        cd = self.compute_dtype
        src = xyz if features is None else \
            jnp.concatenate([xyz, features.astype(jnp.float32)], axis=-1)
        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples, self.mlps):
            nbr_idx, cnt = pn2.ball_query(radius, nsample, xyz, new_xyz, mask,
                                          semantics=self.ball_query_semantics)
            grouped = pn2.group_points(src, nbr_idx.reshape(nbr_idx.shape[0], -1))
            grouped = grouped.reshape(*nbr_idx.shape, src.shape[-1])
            grouped_xyz = (grouped[..., :3] - new_xyz[:, :, None, :]).astype(cd)
            if features is not None:
                grouped_feat = grouped[..., 3:].astype(cd)
                if self.use_xyz:
                    grouped_feat = jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
            else:
                grouped_feat = grouped_xyz

            slot_mask = (jnp.arange(nsample)[None, None, :] < cnt[..., None]) \
                & new_mask[..., None]                                  # (B, S, ns)
            x = SharedMLP(mlp, compute_dtype=cd)(grouped_feat, slot_mask, train)
            x = jnp.where(slot_mask[..., None], x, jnp.asarray(-1e9, x.dtype))
            x = x.max(axis=2)                                          # (B, S, C)
            x = jnp.where(x > -1e8, x, jnp.asarray(0.0, x.dtype))
            outs.append(x)
        return new_xyz, jnp.concatenate(outs, axis=-1), new_mask


class FPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolate + unit MLP."""

    mlp: Sequence[int]
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats,
                 unknown_mask, known_mask, train: bool):
        cd = self.compute_dtype
        dist, idx = pn2.three_nn(unknown_xyz, known_xyz, known_mask)
        # coordinates are requires_grad=False in the reference — the weights
        # are selection machinery, not a gradient path (also keeps the AD
        # topology identical between the Pallas and XLA three_nn lowerings)
        weight = jax.lax.stop_gradient(pn2.three_nn_interpolate_weights(dist))
        # gather + weighted-sum in the compute dtype (3 terms — no
        # accumulation-length concern); the feature gather is HBM-bound
        interpolated = pn2.three_interpolate(known_feats.astype(cd), idx,
                                             weight.astype(cd))  # (B, N, C)
        if unknown_feats is not None:
            interpolated = jnp.concatenate(
                [interpolated, unknown_feats.astype(cd)], axis=-1)
        return SharedMLP(self.mlp, compute_dtype=cd)(
            interpolated, unknown_mask, train)


class PointNet2MSG(nn.Module):
    model_cfg: dict
    input_channels: int          # raw point feature count incl. xyz

    @property
    def num_point_features(self):
        return list(self.model_cfg['FP_MLPS'][0])[-1]

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict['points']                     # (B, N, C)
        mask = batch_dict.get('point_valid_mask')
        if mask is None:
            mask = jnp.ones(points.shape[:2], dtype=bool)
        xyz = points[..., 0:3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        sa_cfg = self.model_cfg['SA_CONFIG']
        # bf16 activations through the SA/FP stacks (hvpr.yaml opts in): the
        # train-time point stream is ~95% HBM-bound, so the byte count is the
        # cost; params/BN-stats/geometry stay f32. Output is cast back to f32.
        cd = _dtype_of(self.model_cfg.get('COMPUTE_DTYPE', 'fp32'))
        l_xyz, l_feats, l_mask = [xyz], [feats], [mask]
        for k in range(len(sa_cfg['NPOINTS'])):
            nx, nf, nm = SAModuleMSG(
                npoint=int(sa_cfg['NPOINTS'][k]),
                radii=list(sa_cfg['RADIUS'][k]),
                nsamples=list(sa_cfg['NSAMPLE'][k]),
                mlps=[list(m) for m in sa_cfg['MLPS'][k]],
                use_xyz=sa_cfg.get('USE_XYZ', True),
                # exact sequential FPS by default (reference CUDA semantics);
                # FPS_CHUNKS > 1 opts into the Morton-chunked approximation
                # (the shipped flagship configs set 16 for train throughput)
                fps_chunks=int(sa_cfg.get('FPS_CHUNKS', 1)),
                # 'auto' | 'first' | 'bucket' — see ops.pointnet2.ball_query;
                # the AP-level A/B pins bucket-vs-first at <0.3 AP
                ball_query_semantics=str(sa_cfg.get('BALL_QUERY', 'auto')),
                compute_dtype=cd,
            )(l_xyz[k], l_feats[k], l_mask[k], train)
            l_xyz.append(nx)
            l_feats.append(nf)
            l_mask.append(nm)

        fp_mlps = [list(m) for m in self.model_cfg['FP_MLPS']]
        for i in range(len(fp_mlps) - 1, -1, -1):
            l_feats[i] = FPModule(fp_mlps[i], compute_dtype=cd)(
                l_xyz[i], l_xyz[i + 1], l_feats[i], l_feats[i + 1],
                l_mask[i], l_mask[i + 1], train)

        batch_dict['point_features'] = l_feats[0].astype(jnp.float32)
        batch_dict['point_coords'] = l_xyz[0]
        return batch_dict


class PointNet2MSG_NOFP(nn.Module):
    """SA(MSG) stack without feature propagation: features live at the last SA
    level's points (pointnet2_backbone.py:97-172)."""

    model_cfg: dict
    input_channels: int

    @property
    def num_point_features(self):
        return sum(int(m[-1]) for m in self.model_cfg['SA_CONFIG']['MLPS'][-1])

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict['points']
        mask = batch_dict.get('point_valid_mask')
        if mask is None:
            mask = jnp.ones(points.shape[:2], dtype=bool)
        xyz = points[..., 0:3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        sa_cfg = self.model_cfg['SA_CONFIG']
        cd = _dtype_of(self.model_cfg.get('COMPUTE_DTYPE', 'fp32'))
        for k in range(len(sa_cfg['NPOINTS'])):
            xyz, feats, mask = SAModuleMSG(
                npoint=int(sa_cfg['NPOINTS'][k]),
                radii=list(sa_cfg['RADIUS'][k]),
                nsamples=list(sa_cfg['NSAMPLE'][k]),
                mlps=[list(m) for m in sa_cfg['MLPS'][k]],
                use_xyz=sa_cfg.get('USE_XYZ', True),
                fps_chunks=int(sa_cfg.get('FPS_CHUNKS', 16)),
                ball_query_semantics=str(sa_cfg.get('BALL_QUERY', 'auto')),
                compute_dtype=cd,
            )(xyz, feats, mask, train)

        batch_dict['point_features'] = feats.astype(jnp.float32)
        batch_dict['point_coords'] = xyz
        batch_dict['point_valid_mask'] = mask
        return batch_dict
