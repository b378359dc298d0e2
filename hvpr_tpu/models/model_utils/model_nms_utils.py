"""Config-driven NMS wrappers (fixed-shape, jit-safe).

Parity target: /root/reference/pcdet/models/model_utils/model_nms_utils.py
(class_agnostic_nms: score threshold -> top NMS_PRE_MAXSIZE -> rotated NMS ->
cap NMS_POST_MAXSIZE:6-25; multi_classes_nms per-class loop:28-65). The CUDA
``nms_gpu`` dispatch becomes the device fixed-point NMS from ops/nms.py.
"""

import jax
import jax.numpy as jnp

from ...ops.nms import nms_bev_fixed


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None,
                       pre_maxsize=None):
    """Single-sample class-agnostic rotated NMS with fixed-size outputs.

    Args:
        box_scores: (A,) scores.
        box_preds: (A, 7+) boxes.
        nms_config: dict with NMS_THRESH / NMS_PRE_MAXSIZE / NMS_POST_MAXSIZE.
        pre_maxsize: static override of NMS_PRE_MAXSIZE — post_processing
            hoists the hierarchical two-stage decision ABOVE its batch vmap
            (a vmapped lax.cond lowers to select and runs BOTH branches),
            so each branch calls in here with its stage size.
    Returns:
        keep_idx (post,), keep_mask (post,), num_kept () pre-cap survivor count
    """
    scores = box_scores
    if score_thresh is not None:
        scores = jnp.where(box_scores >= score_thresh, box_scores, -jnp.inf)
    pre = int(pre_maxsize if pre_maxsize is not None
              else nms_config['NMS_PRE_MAXSIZE'])
    return nms_bev_fixed(
        box_preds[:, :7], scores, float(nms_config['NMS_THRESH']),
        pre_maxsize=pre, stage1=pre,
        post_maxsize=int(nms_config['NMS_POST_MAXSIZE']))


def multi_classes_nms(cls_scores, box_preds, nms_config, score_thresh=None,
                      pre_maxsize=None):
    """Per-class rotated NMS (multi_classes_nms:28-65), fixed shapes.

    Args:
        cls_scores: (A, num_class); box_preds: (A, 7+).
        pre_maxsize: static NMS_PRE_MAXSIZE override (see class_agnostic_nms).
    Returns:
        boxes (C*post, 7+), scores (C*post,), labels (C*post,) 1-based, mask,
        num_capped () — survivors dropped by the per-class post_maxsize caps.
    """
    num_class = cls_scores.shape[1]
    post_max = int(nms_config['NMS_POST_MAXSIZE'])
    pre = int(pre_maxsize if pre_maxsize is not None
              else nms_config['NMS_PRE_MAXSIZE'])
    outs = []
    num_capped = jnp.zeros((), jnp.int32)
    for c in range(num_class):
        scores_c = cls_scores[:, c]
        if score_thresh is not None:
            scores_c = jnp.where(scores_c >= score_thresh, scores_c, -jnp.inf)
        keep_idx, keep_mask, num_kept = nms_bev_fixed(
            box_preds[:, :7], scores_c, float(nms_config['NMS_THRESH']),
            pre_maxsize=pre, stage1=pre,
            post_maxsize=post_max)
        num_capped += jnp.clip(num_kept - post_max, 0, None)
        outs.append((box_preds[keep_idx], cls_scores[keep_idx, c],
                     jnp.full_like(keep_idx, c + 1), keep_mask))
    boxes = jnp.concatenate([o[0] for o in outs], axis=0)
    scores = jnp.concatenate([o[1] for o in outs], axis=0)
    labels = jnp.concatenate([o[2] for o in outs], axis=0)
    mask = jnp.concatenate([o[3] for o in outs], axis=0)
    return boxes, scores, labels, mask, num_capped
