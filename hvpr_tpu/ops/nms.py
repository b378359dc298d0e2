"""Rotated NMS on device (pure JAX, fixed shapes).

TPU-native replacement for the reference CUDA ``nms_gpu``
(pcdet/ops/iou3d_nms, dispatched from model_nms_utils.py:17,52 via the config
``NMS_TYPE: nms_gpu``, hvpr.yaml:145).

The sequential greedy suppression of the CUDA kernel is reformulated as a
parallel fixed-point iteration: with boxes sorted by score and
``A[i, j] = (iou(i, j) > thresh, j > i)``, the operator

    k <- valid & ~any_i(A[i, j] & k[i])

has the greedy NMS solution as its *unique* fixed point (induction over the
sorted prefix), and each iteration resolves at least one more prefix
position, so a while-loop with a convergence check is exact and typically
terminates in a handful of iterations. Each iteration is one (K, K) masked
reduction — pure VPU work on a matrix that fits in VMEM for K <= 4096.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .rotated_iou import boxes_iou_bev


@partial(jax.jit, static_argnames=('pre_maxsize', 'post_maxsize'))
def nms_bev_fixed(boxes, scores, thresh, pre_maxsize=4096, post_maxsize=500):
    """Rotated BEV NMS with fixed-size outputs.

    Args:
        boxes: (N, 7) [x, y, z, dx, dy, dz, heading]; padded rows allowed.
        scores: (N,) confidence; padded/invalid rows must carry ``-inf``.
        thresh: IoU suppression threshold.
        pre_maxsize: top-K candidates entering NMS (static).
        post_maxsize: max kept boxes (static).

    Returns:
        keep_idx: (post_maxsize,) indices into the input arrays (padded with 0).
        keep_mask: (post_maxsize,) bool validity of each slot.
        num_kept: () int32 — total suppression survivors BEFORE the
            post_maxsize cap; ``num_kept > post_maxsize`` means boxes were
            dropped by the cap (the reference silently truncates the same
            way, model_nms_utils.py:23-24 — here it is observable).
    """
    k = min(pre_maxsize, boxes.shape[0])
    if boxes.shape[0] > k:
        # approx_max_k with aggregate_to_topk performs a cheap partial
        # reduction then an exact sort of the survivors (descending) — the
        # full lax.top_k sort over all anchors dominates NMS cost otherwise
        top_scores, order = jax.lax.approx_max_k(
            scores, k, recall_target=0.99, aggregate_to_topk=True)
    else:
        top_scores, order = jax.lax.top_k(scores, k)
    boxes_k = boxes[order]
    valid = top_scores > -jnp.inf

    iou = boxes_iou_bev(boxes_k, boxes_k)  # (K, K)
    row = jnp.arange(k)
    # A[i, j] = 1 where i suppresses j, as f32 so each iteration is one MXU
    # matvec (bool broadcast+reduce forms are orders of magnitude slower)
    suppress = ((iou > thresh) & (row[:, None] < row[None, :])).astype(jnp.float32)
    valid_f = valid.astype(jnp.float32)

    def cond_fn(state):
        prev, cur, it = state
        return jnp.any(prev != cur) & (it < k)

    def body_fn(state):
        _, cur, it = state
        suppressed = (cur @ suppress) > 0.0
        new = valid_f * (1.0 - suppressed)
        return cur, new, it + 1

    init = (jnp.zeros_like(valid_f), valid_f, jnp.array(0))
    _, keep_f, _ = jax.lax.while_loop(cond_fn, body_fn, init)
    keep = keep_f > 0.0

    # compact kept slots to the front, capped at post_maxsize, preserving score order
    keep_rank = jnp.where(keep, jnp.cumsum(keep) - 1, post_maxsize)  # OOB rank -> dropped
    out_idx = jnp.full((post_maxsize,), k, dtype=jnp.int32)
    out_idx = out_idx.at[keep_rank].set(jnp.arange(k, dtype=jnp.int32), mode='drop')
    slot_valid = out_idx < k
    safe = jnp.where(slot_valid, out_idx, 0)
    keep_idx = order[safe]
    return keep_idx.astype(jnp.int32), slot_valid, keep.sum().astype(jnp.int32)
