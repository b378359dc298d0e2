#!/usr/bin/env python
"""Micro-profile of the eval post-processing sub-stages on one TPU chip.

Decomposes the `full+post` stage of tools/profile_stages.py (7.0 ms at b16,
HBM-bound per the roofline columns) into: sigmoid+thresh, exact top-k
pre-selection, rotated-IoU matrix build, suppression fixed-point loop, and
compaction — to decide which piece a Pallas fusion should attack.
Timing protocol: .claude/skills/verify/SKILL.md (chain N, device_get one
scalar, subtract sync).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'tests/.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from hvpr_tpu.ops.rotated_iou import boxes_iou_bev

BATCH = int(os.environ.get('BENCH_BATCH', '8'))
A = 36704          # anchors/scan at the hvpr.yaml head
K = 1024           # stage-1 NMS size
THRESH = 0.1


def time_fn(jfn, *args, n_iter=30):
    out = jfn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.ravel()[0])
    t0 = time.time()
    for _ in range(n_iter):
        out = jfn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.ravel()[0])
    total = time.time() - t0
    t0 = time.time()
    _ = jax.device_get(leaf.ravel()[0])
    sync = time.time() - t0
    return (total - sync) / n_iter * 1e3


def main():
    rng = np.random.default_rng(0)
    cls_logits = jnp.asarray(
        rng.normal(-4.0, 1.5, (BATCH, A, 1)).astype(np.float32))
    boxes = np.zeros((BATCH, A, 7), np.float32)
    boxes[..., 0] = rng.uniform(0, 47, (BATCH, A))
    boxes[..., 1] = rng.uniform(-19, 19, (BATCH, A))
    boxes[..., 2] = -1.0
    boxes[..., 3:6] = [3.9, 1.6, 1.56]
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (BATCH, A))
    boxes = jnp.asarray(boxes)

    @jax.jit
    def stage_sigmoid(cl):
        s = jax.nn.sigmoid(cl).max(axis=-1)
        return jnp.where(s >= THRESH, s, -jnp.inf)

    scores = stage_sigmoid(cls_logits)

    @jax.jit
    def stage_topk(s):
        return jax.lax.top_k(s, K)

    top_scores, order = stage_topk(scores)

    @jax.jit
    def stage_gather(b, o):
        return jax.vmap(lambda bb, oo: bb[oo])(b, o)

    boxes_k = stage_gather(boxes, order)

    @jax.jit
    def stage_iou(bk):
        return jax.vmap(lambda x: boxes_iou_bev(x, x))(bk)

    iou = stage_iou(boxes_k)

    @jax.jit
    def stage_loop(iou_m, ts):
        def one(iou1, s1):
            valid = s1 > -jnp.inf
            row = jnp.arange(K)
            sup = ((iou1 > 0.1) & (row[:, None] < row[None, :])).astype(
                jnp.float32)
            vf = valid.astype(jnp.float32)

            def cond_fn(st):
                p, c, it = st
                return jnp.any(p != c) & (it < K)

            def body_fn(st):
                _, c, it = st
                sup_by = (c @ sup) > 0.0
                return c, vf * (1.0 - sup_by), it + 1

            _, keep, _ = jax.lax.while_loop(
                cond_fn, body_fn, (jnp.zeros_like(vf), vf, jnp.array(0)))
            return keep
        return jax.vmap(one)(iou_m, ts)

    print(f'b{BATCH} A={A} K={K}')
    print(f'sigmoid+thresh   {time_fn(stage_sigmoid, cls_logits):7.2f} ms')
    print(f'top_k {K}        {time_fn(stage_topk, scores):7.2f} ms')
    print(f'gather boxes     {time_fn(stage_gather, boxes, order):7.2f} ms')
    print(f'iou {K}x{K}      {time_fn(stage_iou, boxes_k):7.2f} ms')
    print(f'suppress loop    {time_fn(stage_loop, iou, top_scores):7.2f} ms')

    # end-to-end current class_agnostic_nms for reference
    from hvpr_tpu.ops.nms import nms_bev_fixed

    @jax.jit
    def full(s, b):
        return jax.vmap(lambda bb, ss: nms_bev_fixed(
            bb, ss, 0.1, pre_maxsize=4096, post_maxsize=500,
            stage1=1024))(b, s)

    print(f'nms_bev_fixed    {time_fn(full, scores, boxes):7.2f} ms')


if __name__ == '__main__':
    main()
