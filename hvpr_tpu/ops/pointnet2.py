"""PointNet++ primitives as fixed-shape JAX ops.

TPU-native replacement for the reference CUDA extensions
``pcdet/ops/pointnet2/pointnet2_batch`` / ``pointnet2_stack``
(setup.py:79-109; consumed by pointnet2_backbone.py:4-6,27,43,254):
furthest point sampling, ball query, grouping, and 3-NN feature propagation.

Design notes (vs the CUDA kernels):
  * everything is fixed-shape and mask-aware — padded points carry a validity
    mask and are pushed to +inf distance so they are never sampled/grouped;
  * FPS is the one inherently sequential op — implemented as a
    ``lax.fori_loop`` of (argmax + running-min update) over the (N,) distance
    vector. It is train-time only in HVPR (the point stream is skipped at
    inference, detectors/pointpillar.py:54-55), so latency pressure is low;
  * ball query keeps the FIRST ``nsample`` in-radius neighbors by point index
    (matching the CUDA kernel's first-found semantics) via a top-k on masked
    indices;
  * all batch handling is via vmap — no batch-idx-prefixed coordinate lists.
"""

from functools import partial

import jax
import jax.numpy as jnp

INF = 1e10


def _fps_one(pts, m, npoint):
    """Exact sequential FPS over one point set: (N, 3), (N,) -> (npoint,)."""
    # start from the first valid point
    first = jnp.argmax(m)
    min_dist = jnp.where(m, INF, -INF)

    def body(i, state):
        min_d, idxs, last = state
        d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, jnp.where(m, d, -INF))
        nxt = jnp.argmax(min_d)
        idxs = idxs.at[i].set(last)
        return min_d, idxs, nxt

    idxs = jnp.zeros((npoint,), dtype=jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(0, npoint, body,
                                   (min_dist, idxs, first.astype(jnp.int32)))
    return idxs


def _morton2(x, y):
    """Interleave two 16-bit ints into a 2D Morton (Z-order) code."""
    def split(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    return split(x) | (split(y) << 1)


@partial(jax.jit, static_argnames=('npoint', 'num_chunks'))
def furthest_point_sample(xyz, mask, npoint, num_chunks=1):
    """Farthest point sampling — exact, or chunk-parallel ("serialized") FPS.

    ``num_chunks=1`` is the exact sequential algorithm (the CUDA
    ``furthest_point_sample`` semantics, reference setup.py:79-109). The
    sequential dependency makes it latency-bound on TPU (npoint dependent
    argmax steps), so for ``num_chunks=G > 1`` the points are sorted by a BEV
    Morton code and split into G equal contiguous chunks; each chunk runs
    exact FPS for npoint/G samples, all chunks in parallel (vmap). Spatial
    coherence of the Z-order makes the union a near-farthest sample
    (fill-distance within ~1.5x of exact — tests/test_fps.py) at ~G x less
    sequential depth. Invalid points sort last, so they concentrate in the
    tail chunks and their samples are masked by the caller's index re-gather.

    Args:
        xyz: (B, N, 3).
        mask: (B, N) bool validity.
        npoint: static number of samples.
        num_chunks: static chunk parallelism; must divide N and npoint
            (auto-reduced otherwise).
    Returns:
        (B, npoint) int32 indices. If fewer than npoint valid points exist,
        indices repeat the farthest remaining valid point.
    """
    n = xyz.shape[1]
    g = max(1, num_chunks)
    while n % g or npoint % g:
        g //= 2
    if g <= 1:
        return jax.vmap(lambda p, m: _fps_one(p, m, npoint))(xyz, mask)

    def order_one(pts, m):
        # quantize BEV coords to 10 bits over the valid extent
        lo = jnp.min(jnp.where(m[:, None], pts, INF), axis=0)[:2]
        hi = jnp.max(jnp.where(m[:, None], pts, -INF), axis=0)[:2]
        span = jnp.clip(hi - lo, 1e-3, None)
        q = jnp.clip(((pts[:, :2] - lo) / span * 1023.0), 0, 1023).astype(jnp.int32)
        key = _morton2(q[:, 0], q[:, 1])
        key = jnp.where(m, key, jnp.int32(2 ** 30))   # invalid last
        return jnp.argsort(key)

    def finish_one(pts_unused, m, order, local):
        base = jnp.arange(g, dtype=jnp.int32)[:, None] * (n // g)
        idx = order.astype(jnp.int32)[(local + base).reshape(-1)]
        # invalid points sort last and can fill whole tail chunks; replace
        # their samples by repeating a valid sample (exact-FPS repeat contract)
        ok = m[idx]
        fallback = idx[jnp.argmax(ok)]
        return jnp.where(ok, idx, fallback)

    b = xyz.shape[0]
    order = jax.vmap(order_one)(xyz, mask)                       # (B, N)
    pts_s = jnp.take_along_axis(xyz, order[..., None], axis=1)
    m_s = jnp.take_along_axis(mask, order, axis=1)
    pts_c = pts_s.reshape(b * g, n // g, 3)
    m_c = m_s.reshape(b * g, n // g)
    if jax.default_backend() == 'tpu':
        # all (batch x chunk) FPS loops run simultaneously in one VMEM-
        # resident Pallas program (chunks on lanes); the XLA twin below
        # round-trips HBM per sequential iteration (ops/pn2_select.py)
        from .pn2_select import fps_chunks_pallas
        local = fps_chunks_pallas(pts_c, m_c, npoint // g)
    else:
        local = jax.vmap(lambda p, mm: _fps_one(p, mm, npoint // g))(
            pts_c, m_c)
    local = local.reshape(b, g, npoint // g)
    return jax.vmap(finish_one)(xyz, mask, order, local)


@partial(jax.jit, static_argnames=('radius', 'nsample', 'semantics'))
def ball_query(radius, nsample, xyz, new_xyz, mask, semantics='auto'):
    """For each center, the first ``nsample`` points within ``radius``.

    Args:
        radius: float.
        nsample: static int.
        xyz: (B, N, 3) support points.
        new_xyz: (B, S, 3) query centers.
        mask: (B, N) support validity.
        semantics: 'auto' (bucket kernel on TPU, first-by-index XLA
            elsewhere — the shipped dispatch), 'first' (force the
            reference CUDA first-by-index rule), or 'bucket' (force the
            bucket-min selection — Pallas on TPU, the exact XLA twin
            elsewhere; used by the AP-level A/B, tests/test_round4_ap_ab.py).
    Returns:
        idx: (B, S, nsample) int32 — first in-radius neighbor repeated into
            empty slots (CUDA-kernel semantics: slot 0's index fills the rest);
        cnt: (B, S) int32 number of genuine neighbors found.

    On TPU this dispatches to the streamed bucket-min Pallas kernel
    (ops/pn2_select.py — no (S, N) HBM materialization, ~10x faster at
    flagship shapes); the XLA path below is the CPU/test twin and the
    semantics oracle.
    """
    assert semantics in ('auto', 'first', 'bucket'), semantics
    on_tpu = jax.default_backend() == 'tpu'
    if semantics == 'bucket' or (semantics == 'auto' and on_tpu):
        if on_tpu:
            from .pn2_select import ball_query_bucket
            return ball_query_bucket(radius, nsample, xyz, new_xyz, mask)
        from .pn2_select import ball_query_bucket_xla
        return ball_query_bucket_xla(radius, nsample, xyz, new_xyz, mask)

    def query_one(pts, centers, m):
        n = pts.shape[0]
        d2 = jnp.sum((centers[:, None, :] - pts[None, :, :]) ** 2, axis=-1)  # (S, N)
        in_ball = (d2 < radius * radius) & m[None, :]
        # first-found semantics: pick the nsample smallest indices among hits
        key = jnp.where(in_ball, jnp.arange(n)[None, :], n).astype(jnp.float32)
        if n >= 1024:
            # a full lax.top_k sorts the n-wide axis per center and costs
            # ~220 ms at (16k, 16k) — approx_max_k's partial reduction is
            # ~10x cheaper; a missed early neighbor swaps in a later
            # in-radius one (interchangeable under the max-pooled MLP)
            neg_key, idx = jax.lax.approx_max_k(-key, nsample,
                                                recall_target=0.95)
        else:
            neg_key, idx = jax.lax.top_k(-key, nsample)  # ascending index order
        found = (-neg_key) < n
        cnt = found.sum(axis=-1).astype(jnp.int32)
        # backfill empty slots with the first hit (or 0 if no hits)
        first_idx = idx[:, 0]
        idx = jnp.where(found, idx, first_idx[:, None])
        return idx.astype(jnp.int32), cnt

    return jax.vmap(query_one)(xyz, new_xyz, mask)


def group_points(features, idx):
    """Gather (B, N, C) features at (B, S, K) indices -> (B, S, K, C)."""
    return jax.vmap(lambda f, i: f[i])(features, idx)


@jax.jit
def three_nn(unknown, known, known_mask):
    """3 nearest neighbors of each unknown point among known points.

    Args:
        unknown: (B, N, 3); known: (B, S, 3); known_mask: (B, S) bool.
    Returns:
        dist: (B, N, 3) distances; idx: (B, N, 3) int32.

    Stays on XLA on every backend: the k=3 ``approx_max_k`` is cheap, and
    the Pallas bucket-min sweep (ops/pn2_select.three_nn_bucket) measured
    SLOWER here (6.2 vs 4.1 ms at flagship shapes — the payload-select
    passes outweigh the avoided (N, S) materialization at k=3).
    """
    def one(u, k, m):
        s = k.shape[0]
        # matmul form |u|^2 + |k|^2 - 2 u.k: the broadcast-subtract form
        # materializes (N, S, 3) planes (~3 GB of traffic at 16384x4096,
        # measured 4.1 ms); the cross term is one MXU pass and the (N, S)
        # output is the only large array (~0.9 ms). Coordinates are centered
        # on the valid-known mean first so the cancellation noise stays
        # ~1e-4 m^2 (f32 eps x |x|^2 <= ~1e3) — reordering only near-ties,
        # whose inverse-distance weights are interchangeable (the same
        # argument as the approx_max_k recall target below).
        ctr = jnp.sum(jnp.where(m[:, None], k, 0.0), axis=0) \
            / jnp.clip(m.sum(), 1, None)
        uc = u - ctr
        kc = jnp.where(m[:, None], k - ctr, 0.0)
        d2 = (jnp.sum(uc * uc, axis=-1)[:, None]
              + jnp.sum(kc * kc, axis=-1)[None, :]
              - 2.0 * (uc @ kc.T))                                   # (N, S)
        d2 = jnp.where(m[None, :], d2, INF)
        if s >= 1024:
            # partial reduction instead of a full per-row sort (see
            # ball_query); a missed true-3rd neighbor contributes a nearly
            # identical inverse-distance weight
            neg_d, idx = jax.lax.approx_max_k(-d2, 3, recall_target=0.95)
        else:
            neg_d, idx = jax.lax.top_k(-d2, 3)
        return jnp.sqrt(jnp.clip(-neg_d, 0, None)), idx.astype(jnp.int32)

    return jax.vmap(one)(unknown, known, known_mask)


@jax.jit
def three_interpolate(features, idx, weight):
    """Inverse-distance weighted interpolation.

    Args:
        features: (B, S, C); idx: (B, N, 3); weight: (B, N, 3).
    Returns:
        (B, N, C).
    """
    def one(f, i, w):
        return (f[i] * w[..., None]).sum(axis=1)

    return jax.vmap(one)(features, idx, weight)


def three_nn_interpolate_weights(dist):
    """Standard PointNet++ 3-NN weights: 1/d^2 normalized."""
    recip = 1.0 / jnp.clip(dist ** 2, 1e-8, None)
    return recip / recip.sum(axis=-1, keepdims=True)
