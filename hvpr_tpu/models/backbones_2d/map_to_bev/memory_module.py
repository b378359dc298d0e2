"""MemAE-style attentive memory module (flax).

Parity target: /root/reference/pcdet/models/backbones_2d/map_to_bev/memory_module.py
(MemoryUnit_Agg: learnable M x C memory, uniform +-1/sqrt(C) init :23-27; train
branch: per-point memory addressing via softmax(points @ W^T):37-38, ReLU hard
shrinkage + L1 renorm:41-45, reconstruction:49, pillar-similarity aggregation
over k:53-57; eval branch: pillar-addressed top-k memory lookup:62-74;
hard_shrink_relu:85-87).

The snapshot's 3-arg/2-arg call mismatch (see SURVEY.md section 0) is resolved
to the evident intent: in training the k attentive point features per pillar
(from the scatter's get_score) are the reconstruction targets' inputs; in eval
the pillar features address the memory directly.

TPU notes: all paths are batched einsums over (B, V, ...) — the (B*V*k, M)
addressing matmul is MXU work; top-k over the M=2000 memory rows is a single
lax.top_k. No per-sample Python loops.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....ops.memory_lookup import memory_lookup_fused
from ....ops.memory_recon import memory_recon


class MemoryUnitAgg(nn.Module):
    mem_dim: int       # M memory rows
    fea_dim: int       # C feature channels
    shrink_thres: float = 0.0025

    def setup(self):
        stdv = 1.0 / jnp.sqrt(self.fea_dim)
        self.weight = self.param(
            'weight',
            lambda key, shape: jax.random.uniform(key, shape, minval=-stdv, maxval=stdv),
            (self.mem_dim, self.fea_dim))

    def _aggregate(self, candidates, pillars, agg_logits=None, valid=None):
        """Similarity-softmax aggregation of (B, V, k, C) candidates per pillar.

        ``agg_logits`` short-circuits the pillar-candidate dot products when
        the caller already has them (eval: they ARE the top-k scores).
        ``valid`` (B, V, k) masks candidates out of the softmax (train: slots
        that had to be filled from padded points); a pillar with zero valid
        candidates aggregates to exactly zero.
        """
        if agg_logits is None:
            agg_logits = (candidates * pillars[..., None, :]).sum(axis=-1)  # (B, V, k)
        if valid is not None:
            agg_logits = jnp.where(valid, agg_logits, -1e9)
        agg_w = jax.nn.softmax(agg_logits, axis=-1)
        agg_w = jax.lax.stop_gradient(agg_w).astype(candidates.dtype)
        out = (agg_w[..., None] * candidates).sum(axis=-2)               # (B, V, C)
        if valid is not None:
            out = jnp.where(valid.any(axis=-1)[..., None], out, 0.0)
        return out

    def train_forward(self, pillars, points, topk_idx, topk_valid=None):
        """Training: reconstruct the k attentive point features from memory.

        The reference addresses the memory with every (pillar, k) gathered
        point feature — B*V*k = 1.28M rows at batch 4, a ~10 GB (rows, M)
        attention matrix if materialized (the reference can, at batch 1 per
        GPU). Two TPU moves:

        1. **Deduplicate before reconstructing** (round 4): reconstruction
           is a pure row-wise function, and the 1.28M gathered rows are
           copies of only B*N = 65k distinct point features — so reconstruct
           each point ONCE and gather the results by ``topk_idx``. Exactly
           the same outputs and gradients (duplicate rows' cotangents sum in
           the gather backward instead of inside the kernel), at 20x less
           matmul work: 59 -> ~3 ms fwd+bwd at batch 4.
        2. The row-local chain (softmax addressing + shrink/renorm +
           reconstruction) runs as the fused Pallas kernel of
           :mod:`hvpr_tpu.ops.memory_recon` — the attention tile never
           leaves VMEM in either pass.

        Args:
            pillars: (B, V, C) pillar features.
            points: (B, N, C) point-stream features (all of them).
            topk_idx: (B, V, k) int32 — per-pillar top-k point indices from
                :func:`attentive_point_pooling`.
            topk_valid: (B, V, k) bool — slots filled from padded points are
                excluded from the aggregation (their "reconstruction" is the
                memory's response to a meaningless padded row).
        Returns:
            dict(output=(B, V, C) aggregated reconstructions).
        """
        b, n, c = points.shape
        recon_all = memory_recon(points.reshape(-1, c), self.weight,
                                 shrink_thres=self.shrink_thres)
        recon_all = recon_all.reshape(b, n, c)
        recon = jnp.take_along_axis(recon_all[:, None, :, :],
                                    topk_idx[..., None], axis=2)  # (B, V, k, C)
        output = self._aggregate(recon, pillars, valid=topk_valid)
        return {'output': output}

    def train_forward_fused(self, pillars, points, neg, thresh):
        """Training path with NO (B, V, k, C) gathers (round 4).

        Same selection set and gradient topology as :meth:`train_forward`
        (which remains as the parity oracle): each point is reconstructed
        from memory ONCE, then the per-pillar aggregation runs as the fused
        top-k-masked attention of :mod:`hvpr_tpu.ops.topk_attend` — the
        selection scores are ``pillar . point`` (the SAME threshold the
        point pooling used), the aggregation logits are
        ``pillar . reconstruction`` (matching _aggregate's candidate-pillar
        dot products), and the only cotangent is the masked-weight
        transposed matmul into the reconstructions. Selection is the
        bucket-threshold SUPERSET of the exact top-k (see topk_attend
        docstring; strictly closer to exact-k than the shipped
        approx_max_k(recall=0.95) gather path).

        Args:
            pillars: (B, V, C). points: (B, N, C).
            neg: (B, N) f32 additive mask — 0 valid, -1e30 padded.
            thresh: (B, V) f32 from ops.topk_attend.bucket_threshold over
                (pillars, points, neg).
        Returns:
            dict(output=(B, V, C) aggregated reconstructions).
        """
        from ....ops.topk_attend import masked_attend
        b, n, c = points.shape
        recon_all = memory_recon(points.reshape(-1, c), self.weight,
                                 shrink_thres=self.shrink_thres)
        recon_all = recon_all.reshape(b, n, c)
        output = masked_attend(pillars, points, recon_all, neg, thresh,
                               shared=False)
        return {'output': output}

    def eval_forward(self, pillars, k, mode: str = 'fused', vmask=None):
        """Inference: pillars address the memory; top-k rows are aggregated.

        TPU note: softmax is monotonic, so top-k runs on the raw logits.
        Three lowering modes (MODEL.MAP_TO_BEV.TOPK_MODE):

        - ``'fused'`` (default): single Pallas kernel — logits, a top-k
          superset threshold, and the softmax-weighted reconstruction all in
          VMEM; never materializes the (B, V, M) logits in HBM
          (ops/memory_lookup.py; A/B-vs-exact tested).
        - ``'exact'``: lax.top_k over the full logits (~250 ms per 16-scan
          batch at M=2000) — the accuracy oracle.
        - ``'approx'``: lax.approx_max_k at recall 0.9 on the 2D flatten
          (11-25 ms) — round-1 default, kept for A/B comparison.

        Args:
            pillars: (B, V, C); k: static int; mode: see above.
            vmask: optional (B, V) pillar validity. When given, the fused
                lookup runs only on the shortest eighth-of-V prefix
                containing every valid row (``lax.switch`` over eight prefix
                lengths, chosen by the LAST valid index — exact for any mask
                layout; invalid rows' outputs are discarded by the canvas
                scatter anyway). The device voxelizer compacts valid pillars
                to a per-sample prefix and a typical KITTI scan fills ~0.6
                of the 16k slots (measured 9.4-9.6k), so serving runs the
                5/8 branch; the round-4 quarter granularity forced 3/4
                (reference contract data_processor.py:50-55).
        Returns:
            dict(output=(B, V, C)); plus att=(B, V, M) addressing logits for
            the exact/approx modes (unused downstream in eval — DCE'd).
        """
        if mode == 'fused':
            b, v, c = pillars.shape

            def run_prefix(vp):
                out_p = memory_lookup_fused(
                    pillars[:, :vp].reshape(b * vp, c), self.weight, k)
                out_p = out_p.reshape(b, vp, c)
                if vp == v:
                    return out_p
                return jnp.concatenate(
                    [out_p, jnp.zeros((b, v - vp, c), out_p.dtype)], axis=1)

            if vmask is None or v < 512:
                out = run_prefix(v)
            else:
                eighths = [max(1, (v * q) // 8) for q in range(1, 9)]
                need = jnp.max(jnp.where(
                    vmask, jnp.arange(v, dtype=jnp.int32)[None, :] + 1, 0))
                level = jnp.searchsorted(jnp.asarray(eighths), need,
                                         side='left')
                out = jax.lax.switch(
                    level, [lambda vp=vp: run_prefix(vp) for vp in eighths])
            return {'output': out.astype(pillars.dtype)}

        logits = jnp.einsum('bvc,mc->bvm', pillars, self.weight)
        logits = jax.lax.stop_gradient(logits)
        b, v, m = logits.shape
        if mode == 'exact':
            vals, idx = jax.lax.top_k(logits, k)                          # (B, V, k)
        else:
            assert mode == 'approx', mode
            # flatten to 2D: approx_max_k lowers ~7x faster on (B*V, M) than
            # on the 3D view (measured 25 ms vs 170 ms at B*V=256k, M=2000)
            vals, idx = jax.lax.approx_max_k(
                logits.reshape(b * v, m), k, recall_target=0.9)
            vals = vals.reshape(b, v, k)
            idx = idx.reshape(b, v, k)
        # gather + aggregate in bf16 (the (B, V, k, C) gather is HBM-bound);
        # the top-k VALUES are exactly the pillar-memory dot products, so they
        # serve directly as the aggregation logits
        mem_topk = self.weight.astype(jnp.bfloat16)[idx]                  # (B, V, k, C)
        output = self._aggregate(mem_topk, pillars.astype(jnp.bfloat16),
                                 agg_logits=vals)
        return {'output': output.astype(pillars.dtype), 'att': logits}

    def __call__(self, pillars, k):
        # default entry used for parameter initialization
        return self.eval_forward(pillars, k)
