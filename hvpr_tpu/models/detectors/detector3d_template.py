"""Detector assembly + post-processing (flax).

Parity target: /root/reference/pcdet/models/detectors/detector3d_template.py
(module topology ['backbone_3d','vfe','map_to_bev','backbone_2d','dense_head']
— HVPR's point-stream-first reorder, :22-25; per-module builders threading
feature dims:50-163; post_processing sigmoid -> NMS -> recall:168-274;
generate_recall_record via 3D IoU:276-318).

TPU-native: the detector is one flax module whose submodules are selected by
the config registries; post-processing is a separate jitted function over
fixed-shape batches (vmap over samples), with recall bookkeeping computed on
device.
"""

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..model_utils.model_nms_utils import class_agnostic_nms, multi_classes_nms
from ...ops.rotated_iou import boxes_iou3d


class Detector3DTemplate(nn.Module):
    """Config-driven assembly of the detection pipeline."""

    model_cfg: dict
    num_class: int
    class_names: Sequence[str]
    grid_size: Sequence[int]               # (nx, ny, nz)
    point_cloud_range: Sequence[float]
    voxel_size: Sequence[float]
    num_point_features: int = 4
    max_points_per_voxel: int = 32      # flat-VFE segment-scan bound

    def setup(self):
        from ..backbones_3d import __all__ as backbones_3d
        from ..backbones_3d.vfe import __all__ as vfes
        from ..backbones_2d import __all__ as backbones_2d
        from ..backbones_2d.map_to_bev import __all__ as map_to_bev
        from ..dense_heads import __all__ as dense_heads

        cfg = self.model_cfg
        self.backbone_3d = None
        if cfg.get('BACKBONE_3D') is not None:
            name = cfg['BACKBONE_3D']['NAME']
            kwargs = dict(model_cfg=cfg['BACKBONE_3D'],
                          input_channels=self.num_point_features)
            if name in ('VoxelBackBone8x', 'VoxelBackBone8xDense',
                        'VoxelResBackBone8x', 'VoxelBackBone8x_voxelrcnn',
                        'UNetV2'):
                kwargs['grid_size'] = self.grid_size  # voxel-grid backbones
            self.backbone_3d = backbones_3d[name](**kwargs)

        self.vfe = None
        vfe_out = self.num_point_features
        if cfg.get('VFE') is not None:
            self.vfe = vfes[cfg['VFE']['NAME']](
                model_cfg=cfg['VFE'],
                num_point_features=self.num_point_features,
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                max_points_per_voxel=self.max_points_per_voxel)
            vfe_out = self.vfe.get_output_feature_dim()

        self.map_to_bev = None
        bev_channels = vfe_out
        if cfg.get('MAP_TO_BEV') is not None:
            self.map_to_bev = map_to_bev[cfg['MAP_TO_BEV']['NAME']](
                model_cfg=cfg['MAP_TO_BEV'], grid_size=self.grid_size)
            bev_channels = int(cfg['MAP_TO_BEV']['NUM_BEV_FEATURES'])

        self.backbone_2d = None
        head_channels = bev_channels
        if cfg.get('BACKBONE_2D') is not None:
            self.backbone_2d = backbones_2d[cfg['BACKBONE_2D']['NAME']](
                model_cfg=cfg['BACKBONE_2D'], input_channels=bev_channels)
            head_channels = self.backbone_2d.num_bev_features

        self.dense_head = None
        if cfg.get('DENSE_HEAD') is not None:
            head_cfg = cfg['DENSE_HEAD']
            self.dense_head = dense_heads[head_cfg['NAME']](
                model_cfg=head_cfg,
                input_channels=head_channels,
                num_class=self.num_class if not head_cfg.get('CLASS_AGNOSTIC', False) else 1,
                class_names=self.class_names,
                grid_size=self.grid_size,
                point_cloud_range=self.point_cloud_range)


def post_processing(batch_dict, post_cfg, num_class):
    """Batched sigmoid -> NMS -> fixed-shape detections + recall stats.

    Args:
        batch_dict: needs batch_cls_preds (B, A, Ncls), batch_box_preds
            (B, A, 7+), optionally gt_boxes (B, M, 8) for recall.
        post_cfg: POST_PROCESSING config dict.
    Returns:
        dict of fixed-shape outputs:
            boxes (B, P, 7), scores (B, P), labels (B, P), mask (B, P),
            recall dict of scalars (summed over batch) when gt present.
    """
    nms_cfg = post_cfg['NMS_CONFIG']
    score_thresh = post_cfg.get('SCORE_THRESH', None)
    recall_thresh_list = list(post_cfg.get('RECALL_THRESH_LIST', []))

    cls_preds = batch_dict['batch_cls_preds']
    # the reference's shape sanity check (detector3d_template.py:187)
    assert cls_preds.shape[-1] in (1, num_class), \
        (cls_preds.shape, num_class)
    box_preds = batch_dict['batch_box_preds']
    if not batch_dict.get('cls_preds_normalized', False):
        cls_preds = jax.nn.sigmoid(cls_preds)

    multi_class = bool(nms_cfg.get('MULTI_CLASSES_NMS', False))

    post_max = int(nms_cfg['NMS_POST_MAXSIZE'])

    def process_one(cls_p, box_p, pre_k):
        """Returns (boxes, scores, labels, mask, capped) — capped = survivors
        dropped by the (per-class) NMS_POST_MAXSIZE cap."""
        if multi_class:
            return multi_classes_nms(
                cls_p, box_p, nms_cfg, score_thresh=score_thresh,
                pre_maxsize=pre_k)
        scores = cls_p.max(axis=-1)
        labels = cls_p.argmax(axis=-1) + 1
        keep_idx, keep_mask, num_kept = class_agnostic_nms(
            scores, box_p, nms_cfg, score_thresh=score_thresh,
            pre_maxsize=pre_k)
        return (box_p[keep_idx], scores[keep_idx],
                labels[keep_idx].astype(jnp.int32), keep_mask,
                jnp.clip(num_kept - post_max, 0, None))

    def run_nms(pre_k):
        return jax.vmap(lambda c, b: process_one(c, b, pre_k))(
            cls_preds, box_preds)

    # Hierarchical NMS (ops/nms.py module docstring): the (K, K) rotated-IoU
    # matrix dominates post-processing, so when few candidates clear
    # SCORE_THRESH a top-K run at the smallest K >= n_live is bit-exact vs
    # the full NMS_PRE_MAXSIZE run. The ladder generalizes the round-3
    # two-stage cond: NMS_STAGE_SIZES (default [NMS_STAGE1_MAXSIZE]) lists
    # ascending stage sizes below pre_max; lax.switch picks the first level
    # that contains every live candidate. The switch lives HERE, above the
    # batch vmap, on an unbatched predicate — a vmapped cond/switch lowers
    # to select and would execute ALL branches.
    pre_max = min(int(nms_cfg['NMS_PRE_MAXSIZE']), cls_preds.shape[1])
    ladder = nms_cfg.get('NMS_STAGE_SIZES',
                         [int(nms_cfg.get('NMS_STAGE1_MAXSIZE', 1024))])
    levels = sorted({min(int(s), pre_max) for s in ladder} | {pre_max})
    if score_thresh is not None and len(levels) > 1:
        if multi_class:
            # each per-class NMS must have its live set inside the level; the
            # max over classes is CONSERVATIVE — one busy class forces a
            # bigger level for all classes (correct, just slower; pinned by
            # tests/test_multiclass.py::
            # test_multiclass_hierarchical_nms_busy_class_fallback)
            n_live = jnp.max(jnp.sum(cls_preds >= score_thresh, axis=1))
        else:
            # the agnostic NMS scores anchors by their max-class score
            n_live = jnp.max(jnp.sum(
                cls_preds.max(axis=-1) >= score_thresh, axis=-1))
        idx = jnp.searchsorted(jnp.asarray(levels), n_live, side='left')
        boxes, scores, labels, mask, capped = jax.lax.switch(
            jnp.minimum(idx, len(levels) - 1),
            [lambda lv=lv: run_nms(lv) for lv in levels])
    else:
        boxes, scores, labels, mask, capped = run_nms(pre_max)
    out = {
        'pred_boxes': boxes, 'pred_scores': scores,
        'pred_labels': labels, 'pred_mask': mask,
        # survivors dropped by the NMS_POST_MAXSIZE cap, per sample
        # (the reference truncates silently; here it is observable)
        'num_capped': capped,
    }

    if 'gt_boxes' in batch_dict and recall_thresh_list:
        out['recall'] = generate_recall_record(
            boxes, mask, batch_dict['batch_box_preds'], batch_dict['gt_boxes'],
            recall_thresh_list)
    return out


def generate_recall_record(final_boxes, final_mask, roi_boxes, gt_boxes, thresh_list):
    """Recall bookkeeping (detector3d_template.py:276-318), batched on device.

    Returns dict of scalars: gt count and per-threshold recalled counts for
    both the raw ('roi') and post-NMS ('rcnn') boxes.
    """
    def one(fb, fm, rb, gt):
        gt_valid = jnp.abs(gt).sum(axis=-1) > 0              # (M,)
        num_gt = gt_valid.sum()

        iou_final = boxes_iou3d(fb[:, :7], gt[:, :7])        # (P, M)
        iou_final = jnp.where(fm[:, None] & gt_valid[None, :], iou_final, 0.0)
        best_final = iou_final.max(axis=0)                   # (M,)

        iou_roi = boxes_iou3d(rb[:, :7], gt[:, :7])
        iou_roi = jnp.where(gt_valid[None, :], iou_roi, 0.0)
        best_roi = iou_roi.max(axis=0)

        rec = {'gt': num_gt}
        for t in thresh_list:
            rec[f'rcnn_{t}'] = (best_final > t).sum()
            rec[f'roi_{t}'] = (best_roi > t).sum()
        return rec

    per_sample = jax.vmap(one)(final_boxes, final_mask, roi_boxes, gt_boxes)
    return {k: v.sum() for k, v in per_sample.items()}
