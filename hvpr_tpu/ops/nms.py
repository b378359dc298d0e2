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

The (K, K) rotated-IoU matrix dominates (36 ms per 8-scan batch at K=4096,
2.3 ms at K=1024), so ``nms_bev_fixed`` is HIERARCHICAL: it first runs the
full algorithm on the top ``stage1`` candidates, which is *exactly*
equivalent to the K=pre_maxsize run whenever at most ``stage1`` scores are
finite (every live candidate is then inside the stage-1 set — the
pre-selection is exact ``lax.top_k``, see ``_nms_topk`` — and -inf rows
neither suppress nor survive); a ``lax.cond`` falls back to the full
pre_maxsize run otherwise. A trained HVPR emits far fewer than 1024
candidates above SCORE_THRESH=0.1, so serving takes the cheap branch while
the reference's NMS_PRE_MAXSIZE=4096 contract (hvpr.yaml:147) is preserved
bit-exactly.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .rotated_iou import boxes_iou_bev


def _nms_topk(boxes, scores, k, thresh, post_maxsize):
    """Greedy NMS over the top-k candidates (fixed-point iteration).

    Candidate pre-selection is EXACT ``lax.top_k``, matching the reference's
    ``torch.topk`` (model_nms_utils.py:13-14). An earlier revision used
    ``lax.approx_max_k(recall_target=0.99)``, which can silently drop a live
    candidate when two finite scores share a reduction bin; measured on a
    v5e chip the exact sort costs only ~0.02 ms/scan more at the flagship
    36,704-anchor head (0.104 vs 0.083 ms), so exactness is free for all
    practical purposes. Exactness at flagship anchor counts is pinned by
    tests/test_nms_voxelizer.py::test_nms_preselect_exact_flagship.
    """
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


@partial(jax.jit, static_argnames=('pre_maxsize', 'post_maxsize', 'stage1'))
def nms_bev_fixed(boxes, scores, thresh, pre_maxsize=4096, post_maxsize=500,
                  stage1=1024):
    """Rotated BEV NMS with fixed-size outputs (hierarchical, exact).

    Args:
        boxes: (N, 7) [x, y, z, dx, dy, dz, heading]; padded rows allowed.
        scores: (N,) confidence; padded/invalid rows must carry ``-inf``.
        thresh: IoU suppression threshold.
        pre_maxsize: top-K candidates entering NMS (static) — the reference
            contract (hvpr.yaml:147).
        post_maxsize: max kept boxes (static).
        stage1: static size of the cheap first stage; when more than
            ``stage1`` scores are finite a ``lax.cond`` falls back to the
            full ``pre_maxsize`` run (see module docstring). Set
            ``stage1 >= pre_maxsize`` to force the single-stage path.

    Returns:
        keep_idx: (post_maxsize,) indices into the input arrays (padded with 0).
        keep_mask: (post_maxsize,) bool validity of each slot.
        num_kept: () int32 — total suppression survivors BEFORE the
            post_maxsize cap; ``num_kept > post_maxsize`` means boxes were
            dropped by the cap (the reference silently truncates the same
            way, model_nms_utils.py:23-24 — here it is observable).
    """
    k = min(pre_maxsize, boxes.shape[0])
    s1 = min(stage1, k)
    if s1 >= k:
        return _nms_topk(boxes, scores, k, thresh, post_maxsize)

    n_live = jnp.sum(scores > -jnp.inf)
    return jax.lax.cond(
        n_live <= s1,
        lambda b, s: _nms_topk(b, s, s1, thresh, post_maxsize),
        lambda b, s: _nms_topk(b, s, k, thresh, post_maxsize),
        boxes, scores)
