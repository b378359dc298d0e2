"""Pallas BEV canvas builder for SORTED pillar cells.

Replaces the generic scatter path of :func:`hvpr_tpu.ops.scatter.scatter_to_bev`
on the inference path. XLA lowers both the wide scatter (~40 ms per 16-scan
batch at C=160) and the row-id+gather rewrite (~23 ms, per-index bound at
~20 ns/row over 1.17M canvas cells) far from bandwidth. This kernel exploits
the device voxelizer's invariant that pillar cells are SORTED per sample
(grid-linear order): canvas tile t can only contain pillars from the
contiguous index window starting at ``searchsorted(cells, t * TC)``, so each
program loads a two-block window and distributes rows with a one-hot matmul
on the MXU — f32-exact via the split-bf16 (hi + lo residual) trick.

~14 ms for (16, 16000, 160) -> (16, 73408, 160) (DMA-bound), vs 23 ms
for the row-id gather and 40 ms for the wide scatter.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TC = 256          # canvas cells per tile (also the pillar window block rows).
                   # Measured at (16, 16000, 160): 14.2 ms at TC=256, 14.4 at
                   # 128, 21.1 at 1024 — the kernel is bound by the dynamic
                   # window DMAs, not one-hot flops or program count.


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(win_ref, cell0_ref, cell1_ref, feat0_ref, feat1_ref, out_ref):
    t = pl.program_id(1)
    base = t * _TC
    rows = base + jax.lax.broadcasted_iota(jnp.int32, (_TC, _TC), 0)
    exact = out_ref.dtype == jnp.float32

    def distribute(cell_ref, feat_ref):
        # (TC, TC) one-hot of window rows landing in this canvas tile.
        # f32 output: exact via the split-bf16 (hi + residual) product.
        # bf16 output: the hi product alone — its error is the same input
        # rounding the output cast would apply anyway, and it halves both
        # the MXU work and the canvas write.
        onehot = (cell_ref[0, 0][None, :] == rows).astype(jnp.bfloat16)
        feat = feat_ref[0]
        hi = feat.astype(jnp.bfloat16)
        acc = jnp.dot(onehot, hi, preferred_element_type=jnp.float32)
        if exact:
            lo = (feat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + jnp.dot(onehot, lo, preferred_element_type=jnp.float32)
        return acc

    out = (distribute(cell0_ref, feat0_ref)
           + distribute(cell1_ref, feat1_ref))
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('ny', 'nx', 'interpret', 'out_dtype'))
def canvas_from_sorted(features, coords, mask, ny, nx, interpret=None,
                       out_dtype=jnp.float32):
    """Dense (B, ny, nx, C) canvas from per-sample SORTED pillar cells.

    Args:
        features: (B, V, C) pillar features.
        coords: (B, V, 3) int (z, y, x); cells (y * nx + x) must be sorted
            ascending per sample over the valid pillars (device-voxelizer
            order). Invalid pillars may hold anything.
        mask: (B, V) validity.
        ny, nx: static grid.
        interpret: force Pallas interpret mode (tests).
        out_dtype: canvas dtype; bfloat16 halves the dominant HBM write
            (the kernel is DMA-bound) at input-rounding-level error.
    Returns:
        (B, ny, nx, C) out_dtype, zeros at empty cells.
    """
    b, v, c = features.shape
    ncells = ny * nx
    n_tiles = -(-ncells // _TC)
    ncells_p = n_tiles * _TC
    sentinel = ncells_p + 1

    cell = coords[..., 1] * nx + coords[..., 2]
    cell = jnp.where(mask, cell, sentinel).astype(jnp.int32)        # (B, V)

    if out_dtype == jnp.bfloat16:
        # overlapping two-block windows make the kernel read each feature row
        # several times (~4x the canvas write); in bf16 mode pre-cast the
        # rows once so those repeated DMA reads are half-width as well
        features = features.astype(jnp.bfloat16)

    vp = _round_up(v, _TC) + _TC                       # +1 block for w + 1
    feat_p = jnp.zeros((b, vp, c), features.dtype).at[:, :v].set(features)
    cell_p = jnp.full((b, vp), sentinel, jnp.int32).at[:, :v].set(cell)
    # (B, 1, Vp): Mosaic requires the 2nd-to-last block dim to divide 8 or
    # equal the array dim — a unit middle axis satisfies the latter
    cell_3d = cell_p[:, None, :]

    # block-unit window starts per (sample, tile)
    tile_base = (jnp.arange(n_tiles, dtype=jnp.int32) * _TC)[None, :]
    lo = jax.vmap(lambda cl: jnp.searchsorted(cl, tile_base[0],
                                              side='left'))(cell_p)
    win = jnp.clip(lo // _TC, 0, vp // _TC - 2).astype(jnp.int32)   # (B, T)

    use_pallas = jax.default_backend() == 'tpu' or interpret
    if not use_pallas:
        # reference semantics for non-TPU backends; mirror the bf16 path's
        # pre-matmul input rounding so both backends agree numerically
        from .scatter import scatter_to_bev
        if out_dtype != jnp.float32:
            features = features.astype(out_dtype)
        return scatter_to_bev(features, coords, mask, ny, nx).astype(out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, _TC), lambda bi, t, w: (bi, 0, w[bi, t])),
            pl.BlockSpec((1, 1, _TC), lambda bi, t, w: (bi, 0, w[bi, t] + 1)),
            pl.BlockSpec((1, _TC, c), lambda bi, t, w: (bi, w[bi, t], 0)),
            pl.BlockSpec((1, _TC, c), lambda bi, t, w: (bi, w[bi, t] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((1, _TC, c), lambda bi, t, w: (bi, t, 0)),
    )
    canvas = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, ncells_p, c), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=bool(interpret),
    )(win, cell_3d, cell_3d, feat_p, feat_p)
    return canvas[:, :ncells].reshape(b, ny, nx, c)
