"""Pillar -> BEV scatter modules, including the HVPR attentive-memory variant.

Parity target: /root/reference/pcdet/models/backbones_2d/map_to_bev/pointpillar_scatter.py
(PointPillarScatter:5-37; PointPillarScatter_Agg_Memory_1_scale:39-221 with
get_score point<->pillar attention:67-83, memory addressing, and the dual BEV
maps emitted during training:137-167).

TPU-native design: the reference's per-sample Python loop over a ragged
batch-idx coordinate list becomes one batched scatter (ops/scatter.py); the
(N_points x N_pillars) attention of get_score is computed in pillar chunks so
the (16384 x 16000) score matrix never materializes at once — each chunk is an
MXU matmul + masked softmax over the point axis + top-k. Gradient topology
matches the reference: the memory-path BEV map receives stop_gradient pillar
features (pointpillar_scatter.py:150), attention/aggregation weights are
stop_gradient (pointpillar_scatter.py:74,80; memory_module.py 'detach').
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....ops.bev_canvas import canvas_from_sorted
from ....ops.scatter import scatter_to_bev
from ....ops.topk_attend import bucket_threshold, masked_attend
from .memory_module import MemoryUnitAgg


def _canvas_dtype(model_cfg):
    """MAP_TO_BEV.CANVAS_DTYPE: 'bf16' emits the (inference) BEV canvas in
    bfloat16 — the canvas write is the largest single HBM transfer on the
    eval path and the kernel is DMA-bound, so half-width halves its cost.
    AP impact bounded by tests/test_topk_ap_ab.py."""
    name = str(model_cfg.get('CANVAS_DTYPE', 'fp32')).lower()
    return jnp.bfloat16 if name in ('bf16', 'bfloat16') else jnp.float32


def _build_canvas(features, coords, mask, ny, nx, cells_sorted,
                  out_dtype=jnp.float32):
    """Sorted device-path pillars use the Pallas tile-window canvas kernel;
    host-voxelized (first-occurrence order) pillars use the generic scatter."""
    if cells_sorted:
        return canvas_from_sorted(features, coords, mask, ny, nx,
                                  out_dtype=out_dtype)
    if out_dtype != jnp.float32:
        features = features.astype(out_dtype)
    return scatter_to_bev(features, coords, mask, ny, nx).astype(out_dtype)


class PointPillarScatter(nn.Module):
    """Plain dense scatter of pillar features into the BEV grid (NHWC)."""

    model_cfg: dict
    grid_size: Sequence[int]   # (nx, ny, nz)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        nx, ny, nz = (int(g) for g in self.grid_size)
        assert nz == 1
        bev = _build_canvas(batch_dict['pillar_features'], batch_dict['voxel_coords'],
                            batch_dict['voxel_mask'], ny, nx,
                            cells_sorted='flat_points' in batch_dict and not train,
                            out_dtype=(_canvas_dtype(self.model_cfg)
                                       if not train else jnp.float32))
        batch_dict['spatial_features'] = bev
        return batch_dict


def attentive_point_pooling(points, point_mask, pillars, k, chunk=2048):
    """get_score (pointpillar_scatter.py:67-83), batched and chunked.

    For each pillar: softmax point<->pillar attention over ALL points, take the
    top-k points, re-weight by pillar-point similarity and sum.

    Args:
        points: (B, N, C) point-stream features.
        point_mask: (B, N) validity.
        pillars: (B, V, C) pillar features.
        k: static top-k.
        chunk: pillars processed per chunk (bounds the (N, chunk) score matrix).
    Returns:
        output: (B, V, C) attentive point feature per pillar.
        topk_idx: (B, V, k) int32 indices of the selected points (memory-path
            consumers gather what they need — returning the gathered
            (B, V, k, C) features themselves cost a 327 MB HBM transpose
            per step at flagship shapes).
        topk_valid: (B, V, k) bool — False where fewer than k valid points
            existed and the selection had to fall back to padded rows.
    """
    b, v, c = pillars.shape
    n = points.shape[1]
    pad = (-v) % chunk
    pillars_p = jnp.pad(pillars, ((0, 0), (0, pad), (0, 0)))
    num_chunks = (v + pad) // chunk
    pillars_c = pillars_p.reshape(b, num_chunks, chunk, c).transpose(1, 0, 2, 3)

    neg = jnp.where(point_mask, 0.0, -1e9)                    # (B, N)

    def process(pillar_chunk):                                # (B, chunk, C)
        # the reference softmaxes the scores before its top-k, but softmax is
        # monotonic along the selection axis — the RAW scores give identical
        # indices, so the exp/renorm passes over the (chunk, N) matrix are
        # dead weight and are dropped. Computed directly in (chunk, N)
        # orientation (no HBM transpose). No remat: nothing differentiable
        # flows through the score matrix (indices are ints, aggregation
        # weights are stop_gradient), so backward never recomputes the
        # matmul and the saved residuals are just idx/pts.
        score_t = (jnp.einsum('bvc,bnc->bvn', pillar_chunk, points)
                   + neg[:, None, :])                         # (B, chunk, N)
        bb, vv, nn = score_t.shape
        # approx_max_k on a 2D flatten: full top_k sorts the 16384-point axis
        # per pillar and dominates the step (see memory_module eval notes)
        _, idx = jax.lax.approx_max_k(
            jax.lax.stop_gradient(score_t).reshape(bb * vv, nn), k,
            recall_target=0.95)
        idx = idx.reshape(bb, vv, k)                          # (B, chunk, k)
        pts = jnp.take_along_axis(points[:, None, :, :],
                                  idx[..., None], axis=2)      # (B, chunk, k, C)
        # a sample with < k valid points forces padded rows into the top-k:
        # zero their features and mask them out of the aggregation softmax
        # (the reference's ragged batch only ever contains real points)
        sel_neg = jnp.take_along_axis(neg[:, None, :], idx, axis=2)  # (B, chunk, k)
        pts = jnp.where(sel_neg[..., None] < -0.5, 0.0, pts)
        agg_logits = ((pillar_chunk[:, :, None, :] * pts).sum(-1)
                      + sel_neg)                              # (B, chunk, k)
        agg_w = jax.lax.stop_gradient(jax.nn.softmax(agg_logits, axis=-1))
        out = (agg_w[..., None] * pts).sum(axis=2)            # (B, chunk, C)
        return out, idx, sel_neg > -0.5

    outs, idxs, valids = jax.lax.map(process, pillars_c)      # (nc, B, chunk, ...)
    output = outs.transpose(1, 0, 2, 3).reshape(b, v + pad, c)[:, :v]
    topk_idx = idxs.transpose(1, 0, 2, 3).reshape(b, v + pad, k)[:, :v]
    topk_valid = valids.transpose(1, 0, 2, 3).reshape(b, v + pad, k)[:, :v]
    return output, topk_idx, topk_valid


class PointPillarScatterAggMemory1Scale(nn.Module):
    """HVPR scatter: memory-fused (+ point-fused in training) BEV maps."""

    model_cfg: dict
    grid_size: Sequence[int]

    def setup(self):
        self.memory = MemoryUnitAgg(
            mem_dim=int(self.model_cfg['NUM_M']),
            fea_dim=int(self.model_cfg['NUM_PT_FEATURES']),
            shrink_thres=float(self.model_cfg['SHRINK_TH']))
        # eval top-k lowering: 'fused' Pallas kernel (default) / 'approx'
        # (lax.approx_max_k, recall 0.9) / 'exact' (lax.top_k oracle);
        # EXACT_TOPK: True is an alias for 'exact'.
        mode = str(self.model_cfg.get('TOPK_MODE', 'fused')).lower()
        if self.model_cfg.get('EXACT_TOPK', False):
            mode = 'exact'
        assert mode in ('fused', 'approx', 'exact'), mode
        self.topk_mode = mode
        # train-path point<->pillar aggregation lowering (round 4):
        # 'fused' — ops/topk_attend bucket-threshold + masked-softmax matmul
        #   kernels, zero (B, V, k, C) gathers (pooling fwd+bwd 64.5 ms +
        #   memory 36.4 ms -> matmul-bound; selection is a tie-inclusive
        #   SUPERSET of exact top-k);
        # 'gather' — approx_max_k + take_along_axis (rounds 1-3, the parity
        #   oracle for tests/A-B).
        train_mode = str(
            self.model_cfg.get('TRAIN_ATTEND_MODE', 'fused')).lower()
        assert train_mode in ('fused', 'gather'), train_mode
        self.train_attend_mode = train_mode

    def __call__(self, batch_dict, train: bool = False):
        nx, ny, nz = (int(g) for g in self.grid_size)
        assert nz == 1
        k = int(self.model_cfg['NUM_K'])

        pillars = batch_dict['pillar_features']               # (B, V, C)
        scale = batch_dict['pillar_scale_features']           # (B, V, Cs)
        coords = batch_dict['voxel_coords']
        vmask = batch_dict['voxel_mask']

        if train:
            points = batch_dict['point_features']             # (B, N, Cp)
            pmask = batch_dict.get('point_valid_mask')
            if pmask is None:
                pmask = jnp.ones(points.shape[:2], dtype=bool)

            if self.train_attend_mode == 'fused':
                # one top-k threshold feeds BOTH aggregations — the
                # reference reuses get_score's top-k set for the memory
                # path the same way (pointpillar_scatter.py:79-83 ->
                # memory_module.py:53-57)
                neg = jnp.where(pmask, 0.0, -1e30).astype(jnp.float32)
                thresh = bucket_threshold(pillars, points, neg, k)
                point_agg = masked_attend(pillars, points, points, neg,
                                          thresh, shared=True)
                mem = self.memory.train_forward_fused(pillars, points, neg,
                                                      thresh)
            else:
                point_agg, topk_idx, topk_valid = attentive_point_pooling(
                    points, pmask, pillars, k)
                mem = self.memory.train_forward(pillars, points, topk_idx,
                                                topk_valid)
            mem_agg = mem['output']                           # (B, V, C)

            fused_mem = jnp.concatenate(
                [jax.lax.stop_gradient(pillars), mem_agg], axis=-1)
            fused_point = jnp.concatenate([pillars, point_agg], axis=-1)

            # one scatter for all three maps: the row-id canvas build is
            # per-(coords, mask), so three separate calls would rebuild the
            # identical scatter map three times (the eval branch already
            # slices one fused canvas the same way)
            fused = jnp.concatenate([fused_mem, fused_point, scale], axis=-1)
            canvas = scatter_to_bev(fused, coords, vmask, ny, nx)
            c_mem = fused_mem.shape[-1]
            c_pt = fused_point.shape[-1]
            batch_dict['spatial_features'] = canvas[..., :c_mem]
            batch_dict['spatial_features_point'] = canvas[..., c_mem:c_mem + c_pt]
            batch_dict['spatial_scale_features'] = canvas[..., c_mem + c_pt:]
            batch_dict['point_positive_features'] = point_agg
            batch_dict['memory_positive_features'] = mem_agg
            batch_dict['memory_items'] = self.memory.weight
        else:
            mem = self.memory.eval_forward(pillars, k, mode=self.topk_mode,
                                           vmask=vmask)
            # two canvas writes: [pillar | memory] is exactly 128 channels
            # (one lane tile) and scale is 32; a single 160-channel canvas
            # pads its second lane tile 4x and measured 3.67 ms vs 3.02 for
            # the split at batch 8 (the scatter-window build is re-run, but
            # the kernel is DMA-bound and the write is what shrinks)
            fused = jnp.concatenate([pillars, mem['output']], axis=-1)
            sorted_cells = 'flat_points' in batch_dict
            out_dtype = _canvas_dtype(self.model_cfg)
            batch_dict['spatial_features'] = _build_canvas(
                fused, coords, vmask, ny, nx, cells_sorted=sorted_cells,
                out_dtype=out_dtype)
            batch_dict['spatial_scale_features'] = _build_canvas(
                scale, coords, vmask, ny, nx, cells_sorted=sorted_cells,
                out_dtype=out_dtype)
        return batch_dict
