"""Grouped multi-head anchor head (flax).

Parity target: /root/reference/pcdet/models/dense_heads/anchor_head_multi.py
(SingleHead per-group conv head:9-148, shared conv + head assembly:151-196,
per-head losses:245-373). Plain single-path head (no HVPR point branch) used
for multi-class configs; each RPN head owns a class subset with its own
anchors and 1x1 prediction convs over an optional shared conv trunk.
"""

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import box_coder_utils, common_utils, loss_utils
from .anchor_head_single import (add_sin_difference, build_anchors,
                                 get_direction_target)
from .target_assigner.axis_aligned_target_assigner import AxisAlignedTargetAssigner
from ..model_utils.layers import ConvBNReLU


class SingleHead(nn.Module):
    """One class-group head: optional conv trunk + per-class 1x1 cls/box/dir.

    Per-class convs keep the per-location anchor ordering explicit: within a
    head, anchors are emitted class-major (matching the target assigner's
    per-location (class, size, rot) layout).
    """

    class_anchor_counts: Sequence[int]   # ns_c * nr_c for each class in the group
    global_class_indices: Sequence[int]  # index of each class in class_names
    num_global_classes: int
    code_size: int
    num_dir_bins: int
    use_dir: bool
    head_conv_filters: Sequence[int] = ()

    @nn.compact
    def __call__(self, feat, train: bool):
        x = feat
        for ch in self.head_conv_filters:
            x = ConvBNReLU(ch)(x, train)
        pi = 0.01
        b, h, w, _ = x.shape
        cls_parts, box_parts, dir_parts = [], [], []
        for na_c, gcls in zip(self.class_anchor_counts, self.global_class_indices):
            cls_c = nn.Conv(na_c, (1, 1),
                            bias_init=nn.initializers.constant(
                                -math.log((1 - pi) / pi)))(x)       # (b,h,w,na_c)
            full = jnp.full((b, h, w, na_c, self.num_global_classes), -1e9, x.dtype)
            full = full.at[..., gcls].set(cls_c)
            cls_parts.append(full)
            box_parts.append(nn.Conv(na_c * self.code_size, (1, 1),
                                     kernel_init=nn.initializers.normal(0.001))(x)
                             .reshape(b, h, w, na_c, self.code_size))
            if self.use_dir:
                dir_parts.append(nn.Conv(na_c * self.num_dir_bins, (1, 1))(x)
                                 .reshape(b, h, w, na_c, self.num_dir_bins))
        cls = jnp.concatenate(cls_parts, axis=3)       # (b,h,w,na_g,ncls)
        box = jnp.concatenate(box_parts, axis=3)
        dir_ = jnp.concatenate(dir_parts, axis=3) if self.use_dir else None
        return cls, box, dir_


class AnchorHeadMulti(nn.Module):
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
        self.num_anchors_per_loc = num_per_loc   # per class

        self.target_assigner = AxisAlignedTargetAssigner(
            model_cfg=self.model_cfg, class_names=self.class_names,
            box_coder=self.box_coder,
            match_height=target_cfg.get('MATCH_HEIGHT', False))

        shared_filters = self.model_cfg.get('SHARED_CONV_NUM_FILTER')
        self.shared_conv = ConvBNReLU(int(shared_filters)) if shared_filters else None

        rpn_head_cfgs = self.model_cfg.get('RPN_HEAD_CFGS')
        if rpn_head_cfgs is None:
            rpn_head_cfgs = [{'HEAD_CLS_NAME': list(self.class_names)}]
        self.head_class_names = [list(c['HEAD_CLS_NAME']) for c in rpn_head_cfgs]
        use_dir = self.model_cfg.get('USE_DIRECTION_CLASSIFIER', False)

        # heads must jointly cover the classes in class_names order so the
        # concatenated per-location anchors match the assigner layout
        covered = [n for cfg_h in rpn_head_cfgs for n in cfg_h['HEAD_CLS_NAME']]
        assert covered == list(self.class_names), \
            f'RPN_HEAD_CFGS classes {covered} must equal CLASS_NAMES in order'

        heads = []
        for cfg_h in rpn_head_cfgs:
            names = list(cfg_h['HEAD_CLS_NAME'])
            heads.append(SingleHead(
                class_anchor_counts=[num_per_loc[self.class_names.index(n)]
                                     for n in names],
                global_class_indices=[self.class_names.index(n) for n in names],
                num_global_classes=self.num_class,
                code_size=self.box_coder.code_size,
                num_dir_bins=int(self.model_cfg.get('NUM_DIR_BINS', 2)),
                use_dir=use_dir,
                head_conv_filters=list(cfg_h.get('HEAD_CONV_FILTERS', []))))
        self.heads = heads

        code_weights = self.model_cfg['LOSS_CONFIG']['LOSS_WEIGHTS']['code_weights']
        self.cls_loss_func = loss_utils.SigmoidFocalClassificationLoss(alpha=0.25, gamma=2.0)
        self.reg_loss_func = loss_utils.WeightedSmoothL1Loss(code_weights=code_weights)
        self.dir_loss_func = loss_utils.WeightedCrossEntropyLoss()

    def _flat_anchors(self):
        per_loc = []
        for a in self.anchors_list:
            nz, ny, nx, ns, nr, c = a.shape
            per_loc.append(a.reshape(nz * ny * nx, ns * nr, c))
        return jnp.asarray(np.concatenate(per_loc, axis=1).reshape(-1, per_loc[0].shape[-1]))

    def __call__(self, batch_dict, train: bool = False):
        feat = batch_dict['spatial_features_2d']
        if self.shared_conv is not None:
            feat = self.shared_conv(feat, train)

        cls_list, box_list, dir_list = [], [], []
        for head in self.heads:
            cls, box, dir_ = head(feat, train)       # (b, h, w, na_g, ...)
            cls_list.append(cls)
            box_list.append(box)
            if dir_ is not None:
                dir_list.append(dir_)

        # concat along the per-location anchor axis -> assigner-aligned layout
        b = feat.shape[0]
        cls_preds = jnp.concatenate(cls_list, axis=3).reshape(b, -1, self.num_class)
        box_preds = jnp.concatenate(box_list, axis=3).reshape(
            b, -1, self.box_coder.code_size)
        dir_preds = jnp.concatenate(dir_list, axis=3).reshape(
            b, -1, int(self.model_cfg.get('NUM_DIR_BINS', 2))) if dir_list else None

        if train:
            targets = self.target_assigner.assign_targets(
                self.anchors_list, batch_dict['gt_boxes'],
                global_step=batch_dict.get('global_step'))
            loss, tb = self.get_loss(cls_preds, box_preds, dir_preds, targets)
            batch_dict['loss'] = loss
            batch_dict['tb_dict'] = tb
        else:
            batch_cls, batch_box = self.generate_predicted_boxes(
                cls_preds, box_preds, dir_preds)
            batch_dict['batch_cls_preds'] = batch_cls
            batch_dict['batch_box_preds'] = batch_box
            batch_dict['cls_preds_normalized'] = False
        return batch_dict

    def get_loss(self, cls_preds, box_preds, dir_preds, targets):
        lw = self.model_cfg['LOSS_CONFIG']['LOSS_WEIGHTS']
        labels = targets['box_cls_labels']
        b = cls_preds.shape[0]

        cared = labels >= 0
        positives = labels > 0
        negatives = labels == 0
        cls_weights = (negatives + positives).astype(jnp.float32)
        pos_norm = jnp.clip(positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None)
        cls_weights = cls_weights / pos_norm
        cls_targets = jnp.where(cared, labels, 0)
        one_hot = jax.nn.one_hot(cls_targets, self.num_class + 1,
                                 dtype=cls_preds.dtype)[..., 1:]
        cls_loss = self.cls_loss_func(cls_preds, one_hot, weights=cls_weights).sum() / b
        cls_loss = cls_loss * lw['cls_weight']

        reg_weights = positives.astype(jnp.float32) / pos_norm
        preds_sin, targets_sin = add_sin_difference(box_preds, targets['box_reg_targets'])
        loc_loss = self.reg_loss_func(preds_sin, targets_sin, weights=reg_weights).sum() / b
        loc_loss = loc_loss * lw['loc_weight']

        dir_loss = 0.0
        if dir_preds is not None:
            num_bins = int(self.model_cfg.get('NUM_DIR_BINS', 2))
            dir_targets = get_direction_target(
                self._flat_anchors(), targets['box_reg_targets'],
                dir_offset=self.model_cfg.get('DIR_OFFSET', 0.78539), num_bins=num_bins)
            w = positives.astype(jnp.float32)
            w = w / jnp.clip(w.sum(axis=-1, keepdims=True), 1.0, None)
            dir_loss = self.dir_loss_func(dir_preds, dir_targets, weights=w).sum() / b
            dir_loss = dir_loss * lw['dir_weight']

        total = cls_loss + loc_loss + dir_loss
        return total, {'rpn_loss_cls': cls_loss, 'rpn_loss_loc': loc_loss,
                       'rpn_loss_dir': dir_loss, 'rpn_loss': total,
                       'rpn_loss_point': 0.0, 'mem_loss': 0.0}

    def generate_predicted_boxes(self, cls_preds, box_preds, dir_preds):
        anchors_flat = self._flat_anchors()
        batch_box = self.box_coder.decode(box_preds, anchors_flat[None])
        if dir_preds is not None:
            dir_offset = self.model_cfg.get('DIR_OFFSET', 0.78539)
            dir_limit = self.model_cfg.get('DIR_LIMIT_OFFSET', 0.0)
            num_bins = int(self.model_cfg.get('NUM_DIR_BINS', 2))
            dir_labels = dir_preds.argmax(axis=-1)
            period = 2 * np.pi / num_bins
            dir_rot = common_utils.limit_period(
                batch_box[..., 6] - dir_offset, dir_limit, period)
            heading = dir_rot + dir_offset + period * dir_labels.astype(batch_box.dtype)
            batch_box = batch_box.at[..., 6].set(heading)
        return cls_preds, batch_box
