"""BEV 2D conv backbones (flax, NHWC).

Parity target: /root/reference/pcdet/models/backbones_2d/base_bev_backbone.py
(BaseBEVBackbone:6-113 — SECOND/PointPillars conv pyramid + transpose-conv
deblocks + concat; BaseBEVBackbone_Scale:116-315 — adds a parallel scale
stream and per-level SFM residual blocks conv->CBAM(scale)->residual, run
SFM_LAYER_NUMS times, and in training runs the shared-weight pyramid twice
over the memory-fused and point-fused maps).

TPU-native: NHWC layout throughout; the dual train pass shares parameters by
construction (the same submodule instances are applied to both maps).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..model_utils.layers import ConvBNReLU, DeconvBNReLU
from .spatial_attention import SpatialAttention


def _compute_dtype(model_cfg):
    """BACKBONE_2D.COMPUTE_DTYPE: 'bf16' runs the conv pyramid in bfloat16
    (f32 params/BN stats, bf16 activations) — the bulk-FLOPs path rides the
    MXU at double rate and half HBM traffic. AP impact bounded by the A/B in
    tests/test_topk_ap_ab.py."""
    name = str(model_cfg.get('COMPUTE_DTYPE', 'fp32')).lower()
    return jnp.bfloat16 if name in ('bf16', 'bfloat16') else None


class _Block(nn.Module):
    """One pyramid level: strided conv + LAYER_NUMS stride-1 convs."""

    features: int
    stride: int
    layer_num: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool, splits: int = 1):
        x = ConvBNReLU(self.features, stride=self.stride,
                       dtype=self.dtype)(x, train, splits=splits)
        for _ in range(self.layer_num):
            x = ConvBNReLU(self.features, dtype=self.dtype)(x, train,
                                                            splits=splits)
        return x


class BaseBEVBackbone(nn.Module):
    model_cfg: dict
    input_channels: int

    @property
    def num_bev_features(self):
        ups = self.model_cfg.get('NUM_UPSAMPLE_FILTERS')
        if ups:
            return sum(ups)
        return list(self.model_cfg.get('NUM_FILTERS', [self.input_channels]))[-1]

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        layer_nums = list(self.model_cfg.get('LAYER_NUMS', []))
        layer_strides = list(self.model_cfg.get('LAYER_STRIDES', []))
        num_filters = list(self.model_cfg.get('NUM_FILTERS', []))
        upsample_strides = list(self.model_cfg.get('UPSAMPLE_STRIDES', []))
        num_upsample = list(self.model_cfg.get('NUM_UPSAMPLE_FILTERS', []))

        dt = _compute_dtype(self.model_cfg)
        x = batch_dict['spatial_features']
        ups = []
        for i in range(len(layer_nums)):
            x = _Block(num_filters[i], layer_strides[i], layer_nums[i],
                       dtype=dt)(x, train)
            if upsample_strides:
                s = upsample_strides[i]
                if s >= 1:
                    ups.append(DeconvBNReLU(num_upsample[i], int(s), dtype=dt)(x, train))
                else:
                    ups.append(ConvBNReLU(num_upsample[i], kernel_size=int(round(1 / s)),
                                          stride=int(round(1 / s)), padding=0,
                                          dtype=dt)(x, train))
            else:
                ups.append(x)

        if len(ups) > 1:
            x = jnp.concatenate(ups, axis=-1)
        elif ups:
            x = ups[0]
        if len(upsample_strides) > len(layer_nums):
            x = DeconvBNReLU(x.shape[-1], int(upsample_strides[-1]))(x, train)

        batch_dict['spatial_features_2d'] = x
        return batch_dict


class BaseBEVBackboneScale(nn.Module):
    """Scale-aware backbone with CBAM-gated SFM residual blocks."""

    model_cfg: dict
    input_channels: int

    @property
    def num_bev_features(self):
        return sum(self.model_cfg['NUM_UPSAMPLE_FILTERS'])

    def setup(self):
        layer_nums = list(self.model_cfg['LAYER_NUMS'])
        layer_strides = list(self.model_cfg['LAYER_STRIDES'])
        num_filters = list(self.model_cfg['NUM_FILTERS'])
        num_scale = list(self.model_cfg['NUM_SCALE_FILTERS'])
        upsample_strides = list(self.model_cfg['UPSAMPLE_STRIDES'])
        num_upsample = list(self.model_cfg['NUM_UPSAMPLE_FILTERS'])

        self.sfm_layer_nums = list(self.model_cfg['SFM_LAYER_NUMS'])
        dt = _compute_dtype(self.model_cfg)
        self.dt = dt
        self.blocks = [_Block(num_filters[i], layer_strides[i], layer_nums[i],
                              dtype=dt)
                       for i in range(len(layer_nums))]
        self.sfm_blocks = [ConvBNReLU(num_filters[i], dtype=dt)
                           for i in range(len(layer_nums))]
        self.scale_blocks = [ConvBNReLU(num_scale[i], stride=layer_strides[i],
                                        dtype=dt)
                             for i in range(len(layer_nums))]
        self.deblocks = [DeconvBNReLU(num_upsample[i], int(upsample_strides[i]),
                                      dtype=dt)
                         for i in range(len(layer_nums))]
        self.attention = SpatialAttention()

    def _level(self, i, x, y, train, splits=1):
        """One level's SFM stack: conv -> CBAM(scale) -> residual, repeated."""
        x_att = x
        for _ in range(self.sfm_layer_nums[i]):
            t = self.sfm_blocks[i](x_att, train, splits=splits)
            t = self.attention(t, y, train, splits=splits)
            if self.dt is not None:
                t = t.astype(self.dt)          # keep the residual chain bf16
            x_att = t + x_att
        return x_att

    def __call__(self, batch_dict, train: bool = False):
        y = batch_dict['spatial_scale_features']
        x = batch_dict['spatial_features']

        if train and str(self.model_cfg.get('DUAL_PASS', 'stacked')) == 'stacked':
            # ONE batched pass over [memory-fused ; point-fused] instead of
            # two sequential shared-weight passes: convs run at 2x batch
            # (the b4 train pass measured ~2x worse MXU utilization per scan
            # than the b16 eval pass), while SplitBatchNorm reproduces the
            # reference's per-pass BN statistics (base_bev_backbone.py:
            # 228-279) — OUTPUTS are exact vs the sequential oracle
            # (tests/test_dual_pass.py, 2e-5). One bounded deviation: for
            # modules visited multiple times per step (the repeated SFM
            # convs / attention BN), the running-stat EMA updates interleave
            # (x-iter1, pt-iter1, x-iter2, ...) instead of finishing the x
            # pass first — a ~1e-3 relative trajectory difference, far
            # below batch-to-batch stat noise, with the same fixed point.
            # The scale stream y runs once (as upstream) and is tiled
            # across the two halves; the attention BN sees the tiled
            # (identical-stats) halves split-wise. 'sequential' mode below
            # is the parity oracle.
            b = x.shape[0]
            xx = jnp.concatenate([x, batch_dict['spatial_features_point']],
                                 axis=0)
            ups2 = []
            for i, block in enumerate(self.blocks):
                xx = block(xx, train, splits=2)
                y = self.scale_blocks[i](y, train)
                yy = jnp.concatenate([y, y], axis=0)
                lvl = self._level(i, xx, yy, train, splits=2)
                ups2.append(self.deblocks[i](lvl, train, splits=2))
            cat = jnp.concatenate(ups2, axis=-1)
            batch_dict['spatial_features_2d'] = cat[:b]
            batch_dict['spatial_features_point_2d'] = cat[b:]
        elif train:
            x_pt = batch_dict['spatial_features_point']
            ups, ups_pt = [], []
            for i, block in enumerate(self.blocks):
                x = block(x, train)
                x_pt = block(x_pt, train)          # shared weights: same submodule
                y = self.scale_blocks[i](y, train)
                ups.append(self.deblocks[i](self._level(i, x, y, train), train))
                ups_pt.append(self.deblocks[i](self._level(i, x_pt, y, train), train))
            batch_dict['spatial_features_2d'] = jnp.concatenate(ups, axis=-1)
            batch_dict['spatial_features_point_2d'] = jnp.concatenate(ups_pt, axis=-1)
        else:
            ups = []
            for i, block in enumerate(self.blocks):
                x = block(x, train)
                y = self.scale_blocks[i](y, train)
                ups.append(self.deblocks[i](self._level(i, x, y, train), train))
            batch_dict['spatial_features_2d'] = jnp.concatenate(ups, axis=-1)
        return batch_dict
