"""Streamed neighbor-selection kernels for the PointNet++ point stream.

TPU-native replacement for the selection half of the reference CUDA ops
``pcdet/ops/pointnet2`` (ball_query + three_nn; setup.py:79-109, consumed by
pointnet2_backbone.py:27,43): the shipped XLA lowering materializes the full
(centers, points) distance matrix in HBM — 268 MB per radius at flagship
shapes — and runs a 16384-wide ``approx_max_k`` over it (measured 3.9-10 ms
per call at B=4). These kernels never materialize it: one Pallas pass
streams the point axis through VMEM in chunks, computes squared distances
on the VPU in f32 (bf16 matmul distances would quantize ~47 m coordinates
far too coarsely for the r=0.1 ball), and folds a per-center, per-BUCKET
running minimum where bucket = point_index mod 128 (the lane index — the
same strided bucketing as ops/memory_lookup/topk_attend, preserved by any
128-aligned chunking). The (B, Q, 128) bucket-min table is the only HBM
output; the final top-k runs over 128 lanes instead of 16384.

Selection semantics vs the reference CUDA kernels (documented deviation,
same family as the shipped ``approx_max_k(recall=0.95)`` path these kernels
replace):

* ``ball_query``: the reference keeps the FIRST ``nsample`` in-radius points
  by index. The bucket kernel keeps the first in-radius point of each of the
  ``nsample`` lowest-indexed nonempty buckets — exactly the reference set
  whenever no two selected points are 128 apart in index (always true for
  N <= 128; overwhelmingly true after the pipeline's point shuffle), and a
  spatially unbiased in-radius subset otherwise. Neighbors are
  interchangeable under the max-pooled shared MLP (the argument already
  relied on for approx_max_k, ops/pointnet2.py:141-143).
* ``three_nn``: per-bucket argmin of distance; the 3 nearest BUCKETS'
  representatives instead of the 3 nearest points. Identical unless two of
  the true 3 nearest share a bucket; the replacement is the next-nearest
  point outside their buckets, whose inverse-distance weight is nearly
  identical (the prior approx_max_k path accepted the same swap at
  recall 0.95).

Both ops are selection machinery: outputs are indices/counts (AD-inert) and
distances explicitly stop-gradient'd (the reference computes them from
``requires_grad=False`` coordinates).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_NUM_BUCKETS = 128
_INF = 1e10  # ops/pointnet2.INF — the masked-distance sentinel of the XLA twin


def _round_up(x, m):
    return (x + m - 1) // m * m


def _sweep_kernel(cent_ref, pts_ref, neg_ref, key_ref, idx_ref, *,
                  mode, r2, np_, sub):
    """One center block's bucket-min sweep over the WHOLE point axis.

    The point axis is streamed by an in-kernel ``fori_loop`` over ``sub``-wide
    slices of the resident (8, np_) point block rather than by grid steps:
    at flagship shapes the grid-step form was overhead-bound (512 cells x
    ~6 us = 3.0 ms per query) and could not grow its blocks without keeping
    two (block_q, block_n) f32 temporaries alive -> VMEM stack OOM. Here the
    only large VMEM residents are the point block (512 KB at N=16384) and
    the per-iteration (bq, sub) temporaries; the running minima live in the
    (bq, 128) carry. idx is stored as f32 — indices < 2^24 are exact.
    """
    cent = cent_ref[0]                                     # (bq, 128)
    cx, cy, cz = cent[:, 0:1], cent[:, 1:2], cent[:, 2:3]  # (bq, 1)
    bq = cent.shape[0]

    def body(i, carry):
        key_acc, idx_acc = carry                           # (bq, 128) each
        px = pts_ref[0, 0:1, pl.ds(i * sub, sub)]          # (1, sub)
        py = pts_ref[0, 1:2, pl.ds(i * sub, sub)]
        pz = pts_ref[0, 2:3, pl.ds(i * sub, sub)]
        d2 = (cx - px) ** 2 + (cy - py) ** 2 + (cz - pz) ** 2  # (bq, sub)
        d2 = d2 - neg_ref[0, 0:1, pl.ds(i * sub, sub)]     # padded -> huge

        gidx = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1) \
            .astype(jnp.float32) + jnp.float32(i) * jnp.float32(sub)
        if mode == 'ball':
            key = jnp.where(d2 < r2, jnp.broadcast_to(gidx, d2.shape), _BIG)
        else:                           # 'nn': key = d2, payload = index
            key = d2
        kr = key.reshape(bq, sub // _NUM_BUCKETS, _NUM_BUCKETS)
        kmin = kr.min(axis=1)                              # (bq, 128)
        if mode == 'ball':
            pmin = kmin
        else:
            pr = jnp.broadcast_to(gidx, key.shape).reshape(
                bq, sub // _NUM_BUCKETS, _NUM_BUCKETS)
            pmin = jnp.where(kr <= kmin[:, None, :], pr, _BIG).min(axis=1)

        upd = kmin < key_acc
        return (jnp.where(upd, kmin, key_acc),
                jnp.where(upd, pmin, idx_acc))

    init = (jnp.full((bq, _NUM_BUCKETS), _BIG, jnp.float32),
            jnp.zeros((bq, _NUM_BUCKETS), jnp.float32))
    key, idx = jax.lax.fori_loop(0, np_ // sub, body, init)
    key_ref[0] = key
    idx_ref[0] = idx


def _bucket_sweep(centers, points, neg, mode, r2=0.0, block_q=512,
                  block_n=1024, interpret=False):
    """Per-center per-bucket running-min sweep.

    Args:
        centers: (B, Q, 3) f32 query centers.
        points: (B, N, 3) f32 support points.
        neg: (B, N) f32 additive validity mask — 0 valid, -1e30 padded.
        mode: 'ball' (key = in-radius point index) or 'nn' (key = d2).
        block_q: centers per grid cell.
        block_n: slice width of the in-kernel point stream (multiple of 128).
    Returns:
        key (B, Q, 128) f32 bucket minima (= index for 'ball', d2 for 'nn');
        idx (B, Q, 128) f32 point index achieving each bucket minimum.
    """
    b, q, _ = centers.shape
    n = points.shape[1]
    qp = _round_up(q, block_q)
    sub = min(block_n, _round_up(n, _NUM_BUCKETS))
    np_ = _round_up(_round_up(n, _NUM_BUCKETS), sub)

    cent_p = jnp.zeros((b, qp, 128), jnp.float32).at[:, :q, :3].set(
        centers.astype(jnp.float32))
    pts_p = jnp.zeros((b, 8, np_), jnp.float32).at[:, :3, :n].set(
        points.astype(jnp.float32).transpose(0, 2, 1))
    neg_p = jnp.full((b, 1, np_), -_BIG, jnp.float32).at[:, 0, :n].set(neg)

    key, idx = pl.pallas_call(
        functools.partial(_sweep_kernel, mode=mode, r2=float(r2),
                          np_=np_, sub=sub),
        grid=(b, qp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, np_), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, np_), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, qp, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, qp, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
        interpret=bool(interpret),
    )(cent_p, pts_p, neg_p)
    return key[:, :q], idx[:, :q]


def ball_query_bucket(radius, nsample, xyz, new_xyz, mask, interpret=False):
    """Bucketed ball query — same interface as ops.pointnet2.ball_query.

    Returns:
        idx: (B, S, nsample) int32 — the first in-radius point of each of
            the nsample lowest-indexed nonempty buckets; empty slots backfill
            with the first hit (0 when no hits — XLA-twin contract);
        cnt: (B, S) int32 genuine neighbors stored.
    """
    xyz = jax.lax.stop_gradient(xyz)
    new_xyz = jax.lax.stop_gradient(new_xyz)
    neg = jnp.where(mask, 0.0, -_BIG).astype(jnp.float32)
    key, _ = _bucket_sweep(new_xyz, xyz, neg, 'ball',
                           r2=float(radius) * float(radius),
                           interpret=interpret)
    neg_k, _ = jax.lax.top_k(-key, nsample)          # nsample smallest keys
    k_sel = -neg_k                                   # ascending index order
    found = k_sel < _BIG * 0.5
    idx = jnp.where(found, k_sel, 0.0).astype(jnp.int32)
    first = idx[..., 0:1]
    idx = jnp.where(found, idx, first)
    cnt = found.sum(axis=-1).astype(jnp.int32)
    return idx, cnt


def ball_query_bucket_xla(radius, nsample, xyz, new_xyz, mask):
    """Pure-XLA twin of :func:`ball_query_bucket` — identical SEMANTICS.

    Reproduces the Pallas kernel's selection exactly (first in-radius point
    per lane bucket ``index mod 128``, then the ``nsample`` lowest-indexed
    nonempty buckets), without Pallas: runs on any backend. Two uses:

    * pins the kernel's semantics on CPU fixtures WITH mod-128 collisions
      (tests/test_pn2_select.py — interpret-mode kernel == this twin);
    * lets the AP-level A/B (tests/test_round4_ap_ab.py) train a net under
      bucket semantics on the CPU test backend, bounding the documented
      deviation from the reference CUDA first-by-index rule
      (pcdet CUDA ball_query, SURVEY.md §2b N3) at the AP level.
    """
    r2 = jnp.float32(float(radius) * float(radius))
    n = xyz.shape[1]
    np_ = _round_up(n, _NUM_BUCKETS)

    def one(pts, centers, m):
        d2 = jnp.sum((centers[:, None, :].astype(jnp.float32)
                      - pts[None, :, :].astype(jnp.float32)) ** 2, axis=-1)
        d2 = jnp.where(m[None, :], d2, _BIG)                  # (S, N)
        gidx = jnp.arange(n, dtype=jnp.float32)[None, :]
        key = jnp.where(d2 < r2, jnp.broadcast_to(gidx, d2.shape), _BIG)
        if np_ != n:
            key = jnp.pad(key, ((0, 0), (0, np_ - n)),
                          constant_values=_BIG)
        kmin = key.reshape(-1, np_ // _NUM_BUCKETS, _NUM_BUCKETS).min(axis=1)
        return kmin                                           # (S, 128)

    key = jax.vmap(one)(jax.lax.stop_gradient(xyz),
                        jax.lax.stop_gradient(new_xyz), mask)
    neg_k, _ = jax.lax.top_k(-key, nsample)
    k_sel = -neg_k
    found = k_sel < _BIG * 0.5
    idx = jnp.where(found, k_sel, 0.0).astype(jnp.int32)
    first = idx[..., 0:1]
    idx = jnp.where(found, idx, first)
    cnt = found.sum(axis=-1).astype(jnp.int32)
    return idx, cnt


def three_nn_bucket(unknown, known, known_mask, interpret=False):
    """Bucketed 3-NN — same interface as ops.pointnet2.three_nn."""
    unknown = jax.lax.stop_gradient(unknown)
    known = jax.lax.stop_gradient(known)
    neg = jnp.where(known_mask, 0.0, -_BIG).astype(jnp.float32)
    key, pidx = _bucket_sweep(unknown, known, neg, 'nn', interpret=interpret)
    neg_d, pos = jax.lax.top_k(-key, 3)
    d2 = jnp.minimum(-neg_d, _INF)      # masked sentinel parity w/ XLA twin
    idx = jnp.take_along_axis(pidx, pos, axis=-1)
    s = known.shape[1]
    idx = jnp.clip(idx, 0, s - 1).astype(jnp.int32)
    dist = jnp.sqrt(jnp.clip(d2, 0.0, None))
    return jax.lax.stop_gradient(dist), idx


# ---------------------------------------------------------------------------
# chunk-parallel FPS: the whole sequential loop in VMEM, chunks on lanes
# ---------------------------------------------------------------------------


def _fps_kernel(pts_ref, out_ref, mind_ref, *, n_rows, nsamp):
    """Exact FPS inside each lane's chunk; all (batch x chunk) lanes run the
    npoint/G-iteration loop simultaneously. The XLA twin (_fps_one) runs the
    same loop as HLO — one argmax round-trip through HBM per iteration,
    latency-bound at ~25 us/iter; here every operand stays in VMEM.

    pts rows: 0-2 = x/y/z (Morton-sorted, chunked), 3 = validity.
    """
    px = pts_ref[0]                                        # (L, LA)
    py, pz, val = pts_ref[1], pts_ref[2], pts_ref[3]
    mind_ref[:] = jnp.where(val > 0.5, _BIG, -_BIG)
    rows = jax.lax.broadcasted_iota(jnp.int32, px.shape, 0)
    first = jnp.min(jnp.where(val > 0.5, rows, n_rows - 1), axis=0,
                    keepdims=True)                         # (1, LA)

    def body(i, last):
        onehot = rows == last
        lx = jnp.max(jnp.where(onehot, px, -_BIG), axis=0, keepdims=True)
        ly = jnp.max(jnp.where(onehot, py, -_BIG), axis=0, keepdims=True)
        lz = jnp.max(jnp.where(onehot, pz, -_BIG), axis=0, keepdims=True)
        d = (px - lx) ** 2 + (py - ly) ** 2 + (pz - lz) ** 2
        mind = jnp.minimum(mind_ref[:], d)                 # invalid stay -BIG
        mind_ref[:] = mind
        mx = jnp.max(mind, axis=0, keepdims=True)
        nxt = jnp.min(jnp.where(mind == mx, rows, n_rows - 1), axis=0,
                      keepdims=True)                       # first max row
        out_ref[pl.ds(i, 1), :] = last
        return nxt

    jax.lax.fori_loop(0, nsamp, body, first)


def fps_chunks_pallas(pts_chunked, valid_chunked, nsamp_per_chunk,
                      interpret=False):
    """Per-chunk exact FPS over (R, L, 3) chunked point sets.

    Args:
        pts_chunked: (R, L, 3) — R = batch*chunks independent point sets of
            L points each (Morton-sort + reshape done by the caller).
        valid_chunked: (R, L) bool.
        nsamp_per_chunk: static samples per chunk.
    Returns:
        (R, nsamp_per_chunk) int32 LOCAL row indices into each chunk.
    """
    r, l, _ = pts_chunked.shape
    la = _round_up(r, 128)
    pts = jnp.zeros((4, l, la), jnp.float32)
    pts = pts.at[:3, :, :r].set(
        pts_chunked.astype(jnp.float32).transpose(2, 1, 0))
    pts = pts.at[3, :, :r].set(valid_chunked.astype(jnp.float32).T)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, n_rows=l, nsamp=nsamp_per_chunk),
        grid=(la // 128,),
        in_specs=[pl.BlockSpec((4, l, 128), lambda g: (0, 0, g),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nsamp_per_chunk, 128), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsamp_per_chunk, la), jnp.int32),
        scratch_shapes=[pltpu.VMEM((l, 128), jnp.float32)],
        interpret=bool(interpret),
    )(pts)
    return out[:, :r].T                                   # (R, S)
