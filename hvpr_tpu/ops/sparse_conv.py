"""Sparse 3D convolution primitives (pure JAX, fixed shapes).

TPU-native replacement for the spconv library the reference's SECOND-family
backbones depend on (reference backbones_3d/__init__.py:2-3 imports
VoxelBackBone8x etc. whose source is absent; the external dep is spconv,
setup.py:41). XLA has no sparse-conv primitive and densifying KITTI-SECOND's
41x1600x1408 grid is intractable, so convolutions run directly on the active
site list:

- sites are (V, 3) zyx coords + (V, C) features + validity mask, SORTED by
  linear cell index per sample (the device voxelizer's order);
- neighbor lookup is a vectorized binary search (searchsorted) of the
  offset cell id in the sorted site list — no hash table, no host;
- a KxKxK convolution is K^3 (lookup -> gather -> matmul) accumulations;
  matmuls batch over all sites (MXU), gathers are small (V rows);
- submanifold convs (SubMConv3d) keep the input site list; strided sparse
  convs (SparseConv3d) build their output site list with the same
  sort/head-flag compaction the voxelizer uses, capped at a static size.

Weight layout: (K*K*K, C_in, C_out), offset-major in (dz, dy, dx) raster
order — checkpoint-mappable to spconv's (K, K, K, C_in, C_out).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _linear_ids(coords, grid, valid):
    """(V, 3) zyx -> sorted-comparable linear ids; invalid -> +inf sentinel."""
    nz, ny, nx = grid
    lin = (coords[:, 0] * (ny * nx) + coords[:, 1] * nx + coords[:, 2])
    return jnp.where(valid, lin, nz * ny * nx).astype(jnp.int32)


def _lookup(sorted_lin, query_lin, query_valid):
    """Index of each query cell in the sorted site list; miss -> (0, False)."""
    pos = jnp.searchsorted(sorted_lin, query_lin)
    v = sorted_lin.shape[0]
    pos = jnp.clip(pos, 0, v - 1)
    hit = (sorted_lin[pos] == query_lin) & query_valid
    return pos, hit


def _offsets(kernel):
    """(K^3, 3) kernel offsets in (dz, dy, dx) raster order, centered."""
    r = np.arange(kernel) - (kernel - 1) // 2
    return np.stack(np.meshgrid(r, r, r, indexing='ij'), -1).reshape(-1, 3)


@partial(jax.jit, static_argnames=('grid',))
def subm_conv3d(feats, coords, valid, weights, grid):
    """Submanifold sparse conv: output sites == input sites.

    Args:
        feats: (B, V, C_in).
        coords: (B, V, 3) int zyx, sorted by linear id over valid sites.
        valid: (B, V) bool.
        weights: (K^3, C_in, C_out).
        grid: static (nz, ny, nx).
    Returns:
        (B, V, C_out) features on the same sites.
    """
    offs = jnp.asarray(_offsets(round(len(weights) ** (1 / 3))), jnp.int32)
    nz, ny, nx = grid

    def one(f, c, m):
        lin = _linear_ids(c, grid, m)

        def accumulate(carry, ow):
            off, w = ow
            nb = c + off[None, :]
            ok = (m & (nb[:, 0] >= 0) & (nb[:, 0] < nz)
                  & (nb[:, 1] >= 0) & (nb[:, 1] < ny)
                  & (nb[:, 2] >= 0) & (nb[:, 2] < nx))
            nb_lin = _linear_ids(nb, grid, ok)
            pos, hit = _lookup(lin, nb_lin, ok)
            gathered = jnp.where(hit[:, None], f[pos], 0.0)
            return carry + gathered @ w, None

        out, _ = jax.lax.scan(
            accumulate,
            jnp.zeros((f.shape[0], weights.shape[-1]), f.dtype),
            (offs, weights))
        return jnp.where(m[:, None], out, 0.0)

    return jax.vmap(one)(feats, coords, valid)


@partial(jax.jit, static_argnames=('grid', 'stride', 'max_out'))
def sparse_conv3d_downsample(feats, coords, valid, weights, grid, stride,
                             max_out):
    """Strided sparse conv (SparseConv3d, kernel 3, pad 1): new site list.

    Output sites are every stride-decimated cell whose 3x3x3 receptive field
    touches an active input (spconv semantics), discovered with the
    voxelizer's sort + head-flag compaction, capped at ``max_out`` sites.

    Args:
        feats: (B, V, C_in); coords: (B, V, 3) sorted; valid: (B, V).
        weights: (27, C_in, C_out).
        grid: static INPUT (nz, ny, nx); stride: static int.
        max_out: static output site cap.
    Returns:
        out_feats (B, max_out, C_out), out_coords (B, max_out, 3) sorted,
        out_valid (B, max_out), n_dropped (B,) — sites lost to the
        ``max_out`` cap (0 when the cap is adequate).
    """
    assert stride == 2, (
        'the 2-candidates-per-axis parent enumeration assumes stride 2 '
        f'(kernel 3, pad 1); got stride={stride}')
    nz, ny, nx = grid
    og = (-(-nz // stride), -(-ny // stride), -(-nx // stride))
    onz, ony, onx = og
    offs = jnp.asarray(_offsets(3), jnp.int32)

    def one(f, c, m):
        # candidate parents: each input contributes to outputs o with
        # s*o + k - 1 == z for some k in 0..2  =>  o in ceil((z-1)/s)..(z+1)/s
        cand = []
        cand_ok = []
        for d in range(2):  # at most 2 candidate outputs per axis at s=2
            base = (c + 1) // stride - d
            cand.append(base)
        # build the cross-product of per-axis candidates (2^3 combos)
        combos = []
        for bz in range(2):
            for by in range(2):
                for bx in range(2):
                    oc = jnp.stack([cand[bz][:, 0], cand[by][:, 1],
                                    cand[bx][:, 2]], axis=1)
                    # the combo is real iff the input lies in its field
                    back = oc * stride - 1  # top corner of the 3x3x3 field
                    ok = (m & (c[:, 0] - back[:, 0] >= 0) & (c[:, 0] - back[:, 0] < 3)
                          & (c[:, 1] - back[:, 1] >= 0) & (c[:, 1] - back[:, 1] < 3)
                          & (c[:, 2] - back[:, 2] >= 0) & (c[:, 2] - back[:, 2] < 3)
                          & (oc >= 0).all(axis=1)
                          & (oc[:, 0] < onz) & (oc[:, 1] < ony) & (oc[:, 2] < onx))
                    combos.append((oc, ok))
        all_oc = jnp.concatenate([oc for oc, _ in combos], axis=0)    # (8V, 3)
        all_ok = jnp.concatenate([ok for _, ok in combos], axis=0)    # (8V,)

        sentinel = onz * ony * onx
        lin = jnp.where(all_ok,
                        all_oc[:, 0] * (ony * onx) + all_oc[:, 1] * onx
                        + all_oc[:, 2], sentinel)
        order = jnp.argsort(lin)
        slin = lin[order]
        head = (slin < sentinel) & jnp.concatenate(
            [jnp.array([True]), slin[1:] != slin[:-1]])
        rank = jnp.cumsum(head) - 1
        slot = jnp.where(head & (rank < max_out), rank, max_out)
        out_lin = jnp.full((max_out + 1,), sentinel, jnp.int32)
        out_lin = out_lin.at[slot].set(slin.astype(jnp.int32),
                                       mode='drop')[:max_out]
        out_ok = out_lin < sentinel
        oz = out_lin // (ony * onx)
        oyx = out_lin % (ony * onx)
        out_coords = jnp.stack([oz, oyx // onx, oyx % onx], axis=1)

        # gather inputs for each output site over the 27 taps
        in_lin = _linear_ids(c, grid, m)

        def accumulate(carry, ow):
            off, w = ow
            nb = out_coords * stride + off[None, :]  # input-grid coords
            ok = (out_ok & (nb[:, 0] >= 0) & (nb[:, 0] < nz)
                  & (nb[:, 1] >= 0) & (nb[:, 1] < ny)
                  & (nb[:, 2] >= 0) & (nb[:, 2] < nx))
            nb_lin = _linear_ids(nb, grid, ok)
            pos, hit = _lookup(in_lin, nb_lin, ok)
            gathered = jnp.where(hit[:, None], f[pos], 0.0)
            return carry + gathered @ w, None

        out, _ = jax.lax.scan(
            accumulate,
            jnp.zeros((max_out, weights.shape[-1]), f.dtype), (offs, weights))
        n_dropped = jnp.clip(head.sum() - max_out, 0, None).astype(jnp.int32)
        return jnp.where(out_ok[:, None], out, 0.0), out_coords, out_ok, \
            n_dropped

    return jax.vmap(one)(feats, coords, valid)
