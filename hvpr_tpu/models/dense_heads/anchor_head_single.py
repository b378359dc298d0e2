"""Anchor head (single conv head) with the HVPR dual-path losses (flax).

Parity targets:
  /root/reference/pcdet/models/dense_heads/anchor_head_template.py —
    anchor generation:37-52, focal/reg/dir loss builders:73-87, the HVPR
    dual-path (memory + point) cls loss:101-151 and reg loss:178-260,
    sin-difference heading:153-159, direction-bin targets:162-176,
    get_mem_loss MSE(memory, stop_grad(point)) / NV:262-275, 5-tuple
    get_loss:277-291 (intended total rpn + rpn_point + mem, SURVEY.md §0),
    generate_predicted_boxes decode + direction-bin correction:293-340.
  /root/reference/pcdet/models/dense_heads/anchor_head_single.py —
    1x1 conv heads run on both BEV maps in training:40-108, focal bias init
    -log((1-pi)/pi), box weight init normal(0.001):35-38.

TPU-native: losses are computed inside the head under jit on fixed-shape
(B, A) tensors; anchors are baked constants; the target assigner is
vectorized (no per-sample loops).
"""

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import box_coder_utils, common_utils, loss_utils
from .target_assigner.anchor_generator import AnchorGenerator
from .target_assigner.axis_aligned_target_assigner import AxisAlignedTargetAssigner
from .target_assigner.atss_target_assigner import ATSSTargetAssigner


def build_anchors(model_cfg, grid_size, point_cloud_range, anchor_ndim=7):
    """Generate per-class anchor grids (host-side constants)."""
    anchor_generator_cfg = model_cfg['ANCHOR_GENERATOR_CONFIG']
    generator = AnchorGenerator(anchor_range=point_cloud_range,
                                anchor_generator_config=anchor_generator_cfg)
    feature_map_size = [[int(grid_size[0]) // cfg['feature_map_stride'],
                         int(grid_size[1]) // cfg['feature_map_stride']]
                        for cfg in anchor_generator_cfg]
    anchors_list, num_per_loc = generator.generate_anchors(feature_map_size)
    if anchor_ndim != 7:
        anchors_list = [np.concatenate(
            [a, np.zeros([*a.shape[:-1], anchor_ndim - 7], dtype=a.dtype)], axis=-1)
            for a in anchors_list]
    return anchors_list, num_per_loc


def get_direction_target(anchors_flat, reg_targets, dir_offset, num_bins):
    """Direction-bin one-hot targets (anchor_head_template.py:162-176)."""
    rot_gt = reg_targets[..., 6] + anchors_flat[None, :, 6]
    offset_rot = common_utils.limit_period(rot_gt - dir_offset, 0, 2 * np.pi)
    dir_cls = jnp.clip(jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32),
                       0, num_bins - 1)
    return jax.nn.one_hot(dir_cls, num_bins, dtype=reg_targets.dtype)


def add_sin_difference(boxes1, boxes2, dim=6):
    """Encode heading residual as sin(a-b) split (anchor_head_template.py:153-159)."""
    rad_pred = jnp.sin(boxes1[..., dim:dim + 1]) * jnp.cos(boxes2[..., dim:dim + 1])
    rad_tg = jnp.cos(boxes1[..., dim:dim + 1]) * jnp.sin(boxes2[..., dim:dim + 1])
    b1 = jnp.concatenate([boxes1[..., :dim], rad_pred, boxes1[..., dim + 1:]], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :dim], rad_tg, boxes2[..., dim + 1:]], axis=-1)
    return b1, b2


class _Conv1x1Params(nn.Module):
    """Parameter container matching ``nn.Conv(features, (1, 1))``'s tree.

    The three head convs are 1x1 — i.e. one channel-axis matmul each — and
    running them separately reads the (B, H, W, 384) BEV map three times per
    path (the head stage is input-read-bound: 2.9 ms fwd at batch 4 for ~4
    GFLOP). This module only DECLARES the kernel/bias (same names/shapes as
    nn.Conv, so checkpoints and the torch importer are unchanged); the head
    concatenates the kernels and reads the map once.
    """

    features: int
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, in_channels: int):
        kernel = self.param('kernel', self.kernel_init,
                            (1, 1, in_channels, self.features))
        bias = self.param('bias', self.bias_init, (self.features,))
        return kernel, bias


class AnchorHeadSingle(nn.Module):
    model_cfg: dict
    input_channels: int
    num_class: int
    class_names: Sequence[str]
    grid_size: Sequence[int]
    point_cloud_range: Sequence[float]
    predict_boxes_when_training: bool = False

    def setup(self):
        target_cfg = self.model_cfg['TARGET_ASSIGNER_CONFIG']
        self.box_coder = getattr(box_coder_utils, target_cfg['BOX_CODER'])(
            num_dir_bins=target_cfg.get('NUM_DIR_BINS', 6),
            **target_cfg.get('BOX_CODER_CONFIG', {}))

        anchors_list, num_per_loc = build_anchors(
            self.model_cfg, self.grid_size, self.point_cloud_range,
            anchor_ndim=self.box_coder.code_size)
        self.anchors_list = anchors_list
        self.num_anchors_per_location = sum(num_per_loc)

        if target_cfg['NAME'] == 'AxisAlignedTargetAssigner':
            self.target_assigner = AxisAlignedTargetAssigner(
                model_cfg=self.model_cfg, class_names=self.class_names,
                box_coder=self.box_coder,
                match_height=target_cfg.get('MATCH_HEIGHT', False))
        elif target_cfg['NAME'] == 'ATSS':
            self.target_assigner = ATSSTargetAssigner(
                topk=target_cfg['TOPK'], box_coder=self.box_coder,
                match_height=target_cfg.get('MATCH_HEIGHT', False))
        else:
            raise NotImplementedError(target_cfg['NAME'])

        na = self.num_anchors_per_location
        pi = 0.01
        self.conv_cls = _Conv1x1Params(
            na * self.num_class,
            bias_init=nn.initializers.constant(-math.log((1 - pi) / pi)))
        self.conv_box = _Conv1x1Params(na * self.box_coder.code_size,
                                       kernel_init=nn.initializers.normal(0.001))
        self.use_dir = self.model_cfg.get('USE_DIRECTION_CLASSIFIER', False)
        if self.use_dir:
            self.conv_dir = _Conv1x1Params(na * int(self.model_cfg['NUM_DIR_BINS']))
        # matmul dtype for the fused head (f32 accumulation either way);
        # hvpr.yaml sets bf16 to match the backbone's COMPUTE_DTYPE — AP
        # impact bounded by the bf16 leg of tests/test_topk_ap_ab.py
        name = str(self.model_cfg.get('COMPUTE_DTYPE', 'fp32')).lower()
        self.compute_dtype = (jnp.bfloat16 if name in ('bf16', 'bfloat16')
                              else jnp.float32)

        self.cls_loss_func = loss_utils.SigmoidFocalClassificationLoss(alpha=0.25, gamma=2.0)
        code_weights = self.model_cfg['LOSS_CONFIG']['LOSS_WEIGHTS']['code_weights']
        self.reg_loss_func = loss_utils.WeightedSmoothL1Loss(code_weights=code_weights)
        self.dir_loss_func = loss_utils.WeightedCrossEntropyLoss()

    def _flat_anchors(self):
        """All anchors flattened to (A, code) in (ny, nx, class, size, rot) order."""
        per_loc = []
        for a in self.anchors_list:
            nz, ny, nx, ns, nr, c = a.shape
            per_loc.append(a.reshape(nz * ny * nx, ns * nr, c))
        flat = np.concatenate(per_loc, axis=1).reshape(-1, per_loc[0].shape[-1])
        return jnp.asarray(flat)

    def _heads(self, feat):
        """Apply the three 1x1 conv heads to a (B, H, W, C) map.

        Fused: the kernels are concatenated along the output axis and the map
        is read ONCE per pass (one matmul) instead of once per conv; outputs
        are split back. Identical math to three separate 1x1 convs (the
        concat/split VJPs route the gradients to the per-conv params).
        """
        in_ch = feat.shape[-1]
        k_cls, b_cls = self.conv_cls(in_ch)
        k_box, b_box = self.conv_box(in_ch)
        kernels = [k_cls.reshape(in_ch, -1), k_box.reshape(in_ch, -1)]
        biases = [b_cls, b_box]
        if self.use_dir:
            k_dir, b_dir = self.conv_dir(in_ch)
            kernels.append(k_dir.reshape(in_ch, -1))
            biases.append(b_dir)
        w = jnp.concatenate(kernels, axis=-1)                 # (C, n_out)
        bias = jnp.concatenate(biases)
        dt = self.compute_dtype
        out = jnp.einsum('bhwc,cf->bhwf', feat.astype(dt), w.astype(dt),
                         preferred_element_type=jnp.float32) + bias
        n_cls = k_cls.shape[-1]
        n_box = k_box.shape[-1]
        cls = out[..., :n_cls]
        box = out[..., n_cls:n_cls + n_box]
        dir_ = out[..., n_cls + n_box:] if self.use_dir else None
        return cls, box, dir_

    def __call__(self, batch_dict, train: bool = False):
        feat = batch_dict['spatial_features_2d']
        cls_preds, box_preds, dir_preds = self._heads(feat)

        if train:
            # dual path only when the point-fused map exists (HVPR training);
            # plain detectors train single-path
            feat_pt = batch_dict.get('spatial_features_point_2d')
            if feat_pt is not None:
                cls_pt, box_pt, dir_pt = self._heads(feat_pt)
            else:
                cls_pt = box_pt = dir_pt = None
            targets = self.target_assigner.assign_targets(
                self.anchors_list, batch_dict['gt_boxes'],
                global_step=batch_dict.get('global_step'))
            loss, tb = self.get_loss(
                cls_preds, box_preds, dir_preds, cls_pt, box_pt, dir_pt,
                targets, batch_dict)
            batch_dict['loss'] = loss
            batch_dict['tb_dict'] = tb
        else:
            batch_cls, batch_box = self.generate_predicted_boxes(
                cls_preds, box_preds, dir_preds)
            batch_dict['batch_cls_preds'] = batch_cls
            batch_dict['batch_box_preds'] = batch_box
            batch_dict['cls_preds_normalized'] = False
        return batch_dict

    # ------------------------------------------------------------------ losses

    def _cls_loss(self, cls_preds, labels):
        """Focal classification loss over (B, A) labels (template:101-151)."""
        b = cls_preds.shape[0]
        cls_preds = cls_preds.reshape(b, -1, self.num_class)
        cared = labels >= 0
        positives = labels > 0
        negatives = labels == 0
        cls_weights = (negatives + positives).astype(jnp.float32)
        pos_normalizer = jnp.clip(positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None)
        cls_weights = cls_weights / pos_normalizer

        cls_targets = jnp.where(cared, labels, 0)
        if self.num_class == 1:
            cls_targets = jnp.where(positives, 1, cls_targets)
        one_hot = jax.nn.one_hot(cls_targets, self.num_class + 1,
                                 dtype=cls_preds.dtype)[..., 1:]
        loss = self.cls_loss_func(cls_preds, one_hot, weights=cls_weights)
        return loss.sum() / b, pos_normalizer

    def _box_loss(self, box_preds, dir_preds, targets_dict, anchors_flat):
        """Smooth-L1 + direction loss (template:178-260)."""
        b = box_preds.shape[0]
        labels = targets_dict['box_cls_labels']
        reg_targets = targets_dict['box_reg_targets']
        positives = labels > 0
        reg_weights = positives.astype(jnp.float32)
        pos_normalizer = jnp.clip(positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None)
        reg_weights = reg_weights / pos_normalizer

        box_preds = box_preds.reshape(b, -1, self.box_coder.code_size)
        preds_sin, targets_sin = add_sin_difference(box_preds, reg_targets)
        loc_loss = self.reg_loss_func(preds_sin, targets_sin, weights=reg_weights).sum() / b

        dir_loss = 0.0
        if dir_preds is not None:
            num_bins = int(self.model_cfg['NUM_DIR_BINS'])
            dir_targets = get_direction_target(
                anchors_flat, reg_targets,
                dir_offset=self.model_cfg['DIR_OFFSET'], num_bins=num_bins)
            dir_logits = dir_preds.reshape(b, -1, num_bins)
            w = positives.astype(jnp.float32)
            w = w / jnp.clip(w.sum(axis=-1, keepdims=True), 1.0, None)
            dir_loss = self.dir_loss_func(dir_logits, dir_targets, weights=w).sum() / b
        return loc_loss, dir_loss

    def get_loss(self, cls_preds, box_preds, dir_preds,
                 cls_pt, box_pt, dir_pt, targets_dict, batch_dict):
        lw = self.model_cfg['LOSS_CONFIG']['LOSS_WEIGHTS']
        anchors_flat = self._flat_anchors()
        labels = targets_dict['box_cls_labels']

        has_point = cls_pt is not None
        cls_loss, _ = self._cls_loss(cls_preds, labels)
        loc_loss, dir_loss = self._box_loss(box_preds, dir_preds, targets_dict, anchors_flat)
        cls_loss = cls_loss * lw['cls_weight']
        loc_loss = loc_loss * lw['loc_weight']
        dir_loss = dir_loss * lw['dir_weight']

        if has_point:
            cls_loss_pt, _ = self._cls_loss(cls_pt, labels)
            loc_loss_pt, dir_loss_pt = self._box_loss(box_pt, dir_pt, targets_dict, anchors_flat)
            cls_loss_pt = cls_loss_pt * lw['cls_weight']
            loc_loss_pt = loc_loss_pt * lw['loc_weight']
            dir_loss_pt = dir_loss_pt * lw['dir_weight']
        else:
            cls_loss_pt = loc_loss_pt = dir_loss_pt = 0.0

        # memory mimicking loss (template:262-275): MSE(memory, stop_grad(point)),
        # mean over valid voxels' elements, divided again by the voxel count as
        # in the reference
        mem_loss = 0.0
        if 'memory_positive_features' in batch_dict:
            target = jax.lax.stop_gradient(batch_dict['point_positive_features'])
            memory = batch_dict['memory_positive_features']
            vmask = batch_dict['voxel_mask'][..., None].astype(memory.dtype)
            nv = jnp.clip(batch_dict['voxel_mask'].sum().astype(memory.dtype), 1.0, None)
            mse = (((memory - target) ** 2) * vmask).sum() / (nv * memory.shape[-1])
            mem_loss = mse / nv * lw['mem_weight']

        rpn_loss = cls_loss + loc_loss + dir_loss
        rpn_loss_pt = cls_loss_pt + loc_loss_pt + dir_loss_pt
        total = rpn_loss + rpn_loss_pt + mem_loss

        tb = {
            'rpn_loss_cls': cls_loss, 'rpn_loss_cls_pt': cls_loss_pt,
            'rpn_loss_loc': loc_loss, 'rpn_loss_loc_pt': loc_loss_pt,
            'rpn_loss_dir': dir_loss, 'rpn_loss_dir_pt': dir_loss_pt,
            'mem_loss': mem_loss, 'rpn_loss': rpn_loss,
            'rpn_loss_point': rpn_loss_pt,
        }
        return total, tb

    # ------------------------------------------------------------ predictions

    def generate_predicted_boxes(self, cls_preds, box_preds, dir_preds):
        """Decode anchors + residuals, apply direction bins (template:293-340)."""
        b = cls_preds.shape[0]
        anchors_flat = self._flat_anchors()                 # (A, code)
        num_anchors = anchors_flat.shape[0]

        batch_cls = cls_preds.reshape(b, num_anchors, -1)
        batch_box = box_preds.reshape(b, num_anchors, -1)
        batch_box = self.box_coder.decode(batch_box, anchors_flat[None])

        if dir_preds is not None:
            dir_offset = self.model_cfg['DIR_OFFSET']
            dir_limit_offset = self.model_cfg['DIR_LIMIT_OFFSET']
            num_bins = int(self.model_cfg['NUM_DIR_BINS'])
            dir_labels = dir_preds.reshape(b, num_anchors, -1).argmax(axis=-1)
            period = 2 * np.pi / num_bins
            dir_rot = common_utils.limit_period(
                batch_box[..., 6] - dir_offset, dir_limit_offset, period)
            heading = dir_rot + dir_offset + period * dir_labels.astype(batch_box.dtype)
            batch_box = batch_box.at[..., 6].set(heading)
        return batch_cls, batch_box
