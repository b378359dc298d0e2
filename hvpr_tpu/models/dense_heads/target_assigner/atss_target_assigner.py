"""ATSS (Adaptive Training Sample Selection) target assigner — jit-safe.

Parity target: /root/reference/pcdet/models/dense_heads/target_assigner/
atss_target_assigner.py (top-k by center distance, mean+std IoU threshold,
center-in-gt test:75-141). Registered for config parity; the shipped HVPR
config uses AxisAlignedTargetAssigner.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ....ops.rotated_iou import boxes_iou3d, boxes_iou_bev


class ATSSTargetAssigner:
    def __init__(self, topk, box_coder, match_height=False):
        self.topk = topk
        self.box_coder = box_coder
        self.match_height = match_height

    def assign_targets(self, all_anchors, gt_boxes_with_classes,
                       global_step=None):
        # global_step accepted for call-site parity with the axis-aligned
        # assigner; ATSS matching is deterministic so it is unused
        """all_anchors: list of (nz, ny, nx, ns, nr, C); gt: (B, M, 8)."""
        flat = []
        for a in all_anchors:
            nz, ny, nx, ns, nr, c = a.shape
            flat.append(a.reshape(nz * ny * nx, ns * nr, c))
        anchors = jnp.asarray(np.concatenate(flat, axis=1).reshape(-1, flat[0].shape[-1]))

        gt_boxes = gt_boxes_with_classes[..., :7]
        gt_classes = gt_boxes_with_classes[..., 7].astype(jnp.int32)
        gt_valid = jnp.abs(gt_boxes_with_classes).sum(axis=-1) > 0

        out = jax.vmap(partial(self._assign_single, anchors))(gt_boxes, gt_classes, gt_valid)
        return {
            'box_cls_labels': out['labels'],
            'box_reg_targets': out['targets'],
            'reg_weights': out['weights'],
        }

    def _assign_single(self, anchors, gt_boxes, gt_classes, gt_valid):
        num_anchors = anchors.shape[0]
        m = gt_boxes.shape[0]

        if self.match_height:
            iou = boxes_iou3d(anchors, gt_boxes)
        else:
            iou = boxes_iou_bev(anchors, gt_boxes)
        iou = jnp.where(gt_valid[None, :], iou, 0.0)                   # (A, M)

        dist = jnp.linalg.norm(anchors[:, None, 0:3] - gt_boxes[None, :, 0:3], axis=-1)
        dist = jnp.where(gt_valid[None, :], dist, 1e9)

        k = min(self.topk, num_anchors)
        _, topk_idx = jax.lax.top_k(-dist.T, k)                        # (M, k)
        cand_iou = jnp.take_along_axis(iou.T, topk_idx, axis=1)        # (M, k)
        thresh = cand_iou.mean(axis=1) + cand_iou.std(axis=1)          # (M,)

        # candidate anchors above per-gt threshold whose center is inside the gt bev box
        dx = anchors[:, None, 0] - gt_boxes[None, :, 0]
        dy = anchors[:, None, 1] - gt_boxes[None, :, 1]
        cosa = jnp.cos(gt_boxes[None, :, 6])
        sina = jnp.sin(gt_boxes[None, :, 6])
        lx = dx * cosa + dy * sina
        ly = -dx * sina + dy * cosa
        center_in = (jnp.abs(lx) <= gt_boxes[None, :, 3] / 2) & \
                    (jnp.abs(ly) <= gt_boxes[None, :, 4] / 2)

        is_cand = jnp.zeros((m, num_anchors), dtype=bool)
        is_cand = is_cand.at[jnp.arange(m)[:, None], topk_idx].set(True)
        pos_m = is_cand.T & (iou >= thresh[None, :]) & center_in & gt_valid[None, :]

        # each anchor matches its best-iou positive gt
        masked_iou = jnp.where(pos_m, iou, -1.0)
        best_gt = masked_iou.argmax(axis=1)
        fg = masked_iou.max(axis=1) > 0

        labels = jnp.where(fg, gt_classes[best_gt], 0)
        targets = self.box_coder.encode(gt_boxes[best_gt], anchors)
        targets = jnp.where(fg[:, None], targets, 0.0)
        weights = fg.astype(jnp.float32)
        pos_norm = jnp.clip(weights.sum(), 1.0, None)
        return {'labels': labels, 'targets': targets, 'weights': weights / pos_norm}
