"""Fused MemAE memory lookup: logits -> top-k threshold -> softmax @ memory.

Replaces the eval-path memory addressing of the reference
(/root/reference/pcdet/models/backbones_2d/map_to_bev/memory_module.py:60-77):
``softmax(topk(pillars @ mem^T)) @ mem`` per pillar.

TPU-native design. The naive XLA lowering materializes the (B*V, M) logit
matrix in HBM (2 GB at batch 16) and runs a top-k plus a gather over it —
~70 ms per batch, all HBM-bound. Here the selection becomes a THRESHOLD:

- per row, partition the M logits into NB groups and take group maxima;
  the k-th largest group max is provably <= the true k-th largest logit
  (at most k-1 groups can contain an entry above it), so
  ``logits >= threshold`` selects a small SUPERSET of the exact top-k
  (measured +1.6 items on average at M=2000, NB=128).
- the softmax over the selected entries uses exact logits, and the top-k
  gather becomes a (rows, M) @ (M, C) matmul on the MXU — no indices.

Selecting a few extra near-threshold items only adds tail softmax mass —
unlike ``approx_max_k`` (recall 0.9), which *misses* items; the output error
vs exact lax.top_k is at the bf16-matmul rounding floor
(tests/test_memory_lookup.py).

The op runs as THREE Pallas kernels because the k-step threshold loop is
latency-bound (~1.2 us per dependent max+mask iteration regardless of tile
height, measured): it must run on tall (2048-row) tiles over the small
(rows, NB) group-max matrix, while the matmul kernels want short tiles to
fit the (T, M) logits in VMEM. Kernel A computes logits and group maxima;
kernel B runs the k-iteration threshold loop on tall tiles; kernel C
recomputes logits (cheaper than round-tripping them through HBM) and applies
threshold + softmax + the output matmul. ~8 ms vs 30 ms single-kernel and
~70 ms XLA at (256k, 2000, k=20).

On non-TPU backends an XLA emulation with identical semantics is used
(tests, the virtual-CPU-mesh dry run).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_NUM_BUCKETS = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _bmax_kernel(pill_ref, memT_ref, bias_ref, bmax_ref):
    # padded memory columns are masked by an additive bias row (0 valid,
    # -1e30 padded) — one VPU pass instead of the iota+compare+where three
    logits = jnp.dot(pill_ref[:], memT_ref[:],
                     preferred_element_type=jnp.float32)       # (T, Mp)
    logits = logits + bias_ref[:]
    t, mp = logits.shape
    bmax_ref[:] = jnp.max(
        logits.reshape(t, mp // _NUM_BUCKETS, _NUM_BUCKETS), axis=1)


def _thresh_loop(bmax, k):
    """k iterations of max+mask -> the k-th largest value per row.

    Rank-aware under ties: each iteration removes ALL entries equal to the
    current max (one vectorized mask), so it counts how many ranks that
    consumed and freezes the threshold once k ranks are spent — duplicate
    bucket maxima (e.g. duplicate memory rows, bf16-rounded logits) then
    yield exactly lax.top_k(bmax, k)[..., -1], not a value below it."""
    def body(_, carry):
        work, thresh, remaining = carry
        cur = jnp.max(work, axis=-1, keepdims=True)
        ties = jnp.sum((work == cur).astype(jnp.int32), axis=-1, keepdims=True)
        thresh = jnp.where(remaining > 0, cur, thresh)
        remaining = remaining - ties
        return jnp.where(work >= cur, _NEG, work), thresh, remaining

    t = bmax.shape[0]
    _, thresh, _ = jax.lax.fori_loop(
        0, k, body, (bmax, jnp.full((t, 1), _NEG, jnp.float32),
                     jnp.full((t, 1), k, jnp.int32)))
    return thresh


def _thresh_kernel(bmax_ref, th_ref, *, k):
    bmax = bmax_ref[:]
    th = _thresh_loop(bmax, k)                                 # (T2, 1)
    # lane 0 carries the threshold, lane 1 the row max (= max of the bucket
    # maxima) so the apply kernel skips its own full-width max pass
    mx = jnp.max(bmax, axis=-1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, th_ref.shape, 1)
    th_ref[:] = jnp.where(lane == 0, th, mx)


def _apply_kernel(pill_ref, memT_ref, mem_ref, bias_ref, th_ref, out_ref):
    logits = jnp.dot(pill_ref[:], memT_ref[:],
                     preferred_element_type=jnp.float32)       # (T, Mp)
    logits = logits + bias_ref[:]
    th = th_ref[:, :1]
    mx = th_ref[:, 1:2]
    e = jnp.where(logits >= th, jnp.exp(logits - mx), 0.0)
    w = e * pl.reciprocal(jnp.sum(e, axis=-1, keepdims=True), approx=False)
    out_ref[:] = jnp.dot(w.astype(jnp.bfloat16), mem_ref[:],
                         preferred_element_type=jnp.float32)


def _emulation(pillars_p, memT, mem, k, m_valid):
    """XLA path with the same bucket-threshold semantics (non-TPU backends)."""
    logits = jnp.dot(pillars_p, memT, preferred_element_type=jnp.float32)
    r, mp = logits.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, mp), 1)
    logits = jnp.where(col < m_valid, logits, _NEG)
    bmax = jnp.max(logits.reshape(r, mp // _NUM_BUCKETS, _NUM_BUCKETS), axis=1)
    thresh = jax.lax.top_k(bmax, k)[0][:, -1:]
    sel = logits >= thresh
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.where(sel, jnp.exp(logits - mx), 0.0)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.dot(w.astype(jnp.bfloat16), mem,
                   preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=('k', 'block_rows',
                                             'thresh_block_rows', 'interpret'))
def memory_lookup_fused(pillars, memory, k, block_rows=1024,
                        thresh_block_rows=2048, interpret=None):
    """Aggregated top-k memory reconstruction for every pillar row.

    Args:
        pillars: (R, C) float pillar features (R = B*V, flattened by caller).
        memory: (M, C) learnable memory rows.
        k: static top-k (the selected set is a small superset — see module doc).
        block_rows: pillar rows per matmul-kernel program.
        thresh_block_rows: rows per threshold-kernel program (tall).
        interpret: force Pallas interpret mode (tests); default: pallas on TPU,
            XLA emulation elsewhere.
    Returns:
        (R, C) f32 aggregated reconstructions.
    """
    r, c = pillars.shape
    m = memory.shape[0]
    assert memory.shape[1] == c
    assert k <= _NUM_BUCKETS, (k, _NUM_BUCKETS)

    import math
    cp = _round_up(c, 128)
    mp = _round_up(m, max(_NUM_BUCKETS, 128))
    # rp must divide into BOTH grid block sizes — the LCM, not the max
    # (a non-dividing block_rows would silently skip tail rows)
    rp = _round_up(r, math.lcm(block_rows, thresh_block_rows))

    pill_p = jnp.zeros((rp, cp), jnp.bfloat16).at[:r, :c].set(
        pillars.astype(jnp.bfloat16))
    mem_p = jnp.zeros((mp, cp), jnp.bfloat16).at[:m, :c].set(
        memory.astype(jnp.bfloat16))
    memT_p = mem_p.T

    use_pallas = jax.default_backend() == 'tpu' or interpret
    if not use_pallas:
        out = _emulation(pill_p, memT_p, mem_p, k, m)
        return out[:r, :c]

    interp = bool(interpret)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    bias = jnp.where(col < m, 0.0, _NEG).astype(jnp.float32)   # (1, Mp)
    bmax = pl.pallas_call(
        _bmax_kernel,
        grid=(rp // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, _NUM_BUCKETS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, _NUM_BUCKETS), jnp.float32),
        interpret=interp,
    )(pill_p, memT_p, bias)

    thresh = pl.pallas_call(
        functools.partial(_thresh_kernel, k=k),
        grid=(rp // thresh_block_rows,),
        in_specs=[
            pl.BlockSpec((thresh_block_rows, _NUM_BUCKETS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((thresh_block_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, 128), jnp.float32),
        interpret=interp,
    )(bmax)

    out = pl.pallas_call(
        _apply_kernel,
        grid=(rp // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, cp), jnp.float32),
        interpret=interp,
    )(pill_p, memT_p, mem_p, bias, thresh)
    return out[:r, :c]
