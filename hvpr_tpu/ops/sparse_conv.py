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
- a KzxKyxKx convolution is prod(K) (lookup -> gather -> matmul)
  accumulations; matmuls batch over all sites (MXU), gathers are small;
- submanifold convs (SubMConv3d) keep the input site list; strided sparse
  convs (SparseConv3d) build their output site list with the same
  sort/head-flag compaction the voxelizer uses, capped at a static size.

Kernel/stride/padding are per-axis (zyx) so spconv's asymmetric layers —
e.g. VoxelBackBone8x's conv_out: kernel (3,1,1), stride (2,1,1), padding 0 —
map directly.

Weight layout: (Kz*Ky*Kx, C_in, C_out), offset-major in (dz, dy, dx) raster
order — checkpoint-mappable to spconv's (Kz, Ky, Kx, C_in, C_out).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _triple(x):
    """Broadcast an int to a per-axis (z, y, x) tuple."""
    if isinstance(x, (tuple, list)):
        assert len(x) == 3
        return tuple(int(v) for v in x)
    return (int(x),) * 3


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


def _offsets(kernel, centered):
    """(prod(K), 3) tap offsets in (dz, dy, dx) raster order.

    ``centered``: offsets span [-(k-1)//2, k//2] per axis (submanifold);
    otherwise [0, k) relative to the window origin (strided conv).
    """
    kz, ky, kx = kernel
    rs = [np.arange(k) - ((k - 1) // 2 if centered else 0)
          for k in (kz, ky, kx)]
    return np.stack(np.meshgrid(*rs, indexing='ij'), -1).reshape(-1, 3)


@partial(jax.jit, static_argnames=('grid', 'kernel'))
def subm_conv3d(feats, coords, valid, weights, grid, kernel=None):
    """Submanifold sparse conv: output sites == input sites.

    Args:
        feats: (B, V, C_in).
        coords: (B, V, 3) int zyx, sorted by linear id over valid sites.
        valid: (B, V) bool.
        weights: (prod(K), C_in, C_out).
        grid: static (nz, ny, nx).
        kernel: static per-axis kernel size; default: cubic, inferred from
            the weight row count (odd sizes only — subm needs a center tap).
    Returns:
        (B, V, C_out) features on the same sites.
    """
    if kernel is None:
        kernel = _triple(round(len(weights) ** (1 / 3)))
    else:
        kernel = _triple(kernel)
    assert int(np.prod(kernel)) == weights.shape[0], (kernel, weights.shape)
    assert all(k % 2 == 1 for k in kernel), \
        f'submanifold conv needs odd kernels (center tap); got {kernel}'
    offs = jnp.asarray(_offsets(kernel, centered=True), jnp.int32)
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


def sparse_conv3d_out_grid(grid, kernel, stride, padding):
    """Output grid of a strided sparse conv: floor((n + 2p - k)/s) + 1."""
    return tuple((n + 2 * p - k) // s + 1
                 for n, k, s, p in zip(grid, _triple(kernel), _triple(stride),
                                       _triple(padding)))


@partial(jax.jit,
         static_argnames=('grid', 'kernel', 'stride', 'padding', 'max_out'))
def sparse_conv3d(feats, coords, valid, weights, grid, kernel, stride,
                  padding, max_out):
    """Strided sparse conv (spconv SparseConv3d): new output site list.

    Output sites are every strided cell whose KzxKyxKx receptive field
    touches an active input (spconv semantics), discovered with the
    voxelizer's sort + head-flag compaction, capped at ``max_out`` sites.

    Args:
        feats: (B, V, C_in); coords: (B, V, 3) sorted; valid: (B, V).
        weights: (prod(K), C_in, C_out).
        grid: static INPUT (nz, ny, nx).
        kernel, stride, padding: static, int or per-axis (z, y, x).
        max_out: static output site cap.
    Returns:
        out_feats (B, max_out, C_out), out_coords (B, max_out, 3) sorted,
        out_valid (B, max_out), n_dropped (B,) — sites lost to the
        ``max_out`` cap (0 when the cap is adequate).
    """
    kernel, stride, padding = _triple(kernel), _triple(stride), _triple(padding)
    assert int(np.prod(kernel)) == weights.shape[0], (kernel, weights.shape)
    nz, ny, nx = grid
    og = sparse_conv3d_out_grid(grid, kernel, stride, padding)
    onz, ony, onx = og
    assert min(og) > 0, f'empty output grid {og} from {grid} k={kernel} s={stride} p={padding}'
    offs = jnp.asarray(_offsets(kernel, centered=False), jnp.int32)
    # input z contributes to output o iff z = s*o - p + j, j in [0, k):
    # candidates o = floor((z+p)/s) - d for d in [0, ceil(k/s))
    ncand = [-(-k // s) for k, s in zip(kernel, stride)]

    def one(f, c, m):
        combos = []
        for dz in range(ncand[0]):
            for dy in range(ncand[1]):
                for dx in range(ncand[2]):
                    d = jnp.asarray([dz, dy, dx], jnp.int32)
                    pad = jnp.asarray(padding, jnp.int32)
                    st = jnp.asarray(stride, jnp.int32)
                    kn = jnp.asarray(kernel, jnp.int32)
                    oc = (c + pad[None, :]) // st[None, :] - d[None, :]
                    j = c + pad[None, :] - oc * st[None, :]   # tap index
                    ok = (m & (j >= 0).all(axis=1) & (j < kn[None, :]).all(axis=1)
                          & (oc >= 0).all(axis=1)
                          & (oc[:, 0] < onz) & (oc[:, 1] < ony) & (oc[:, 2] < onx))
                    combos.append((oc, ok))
        all_oc = jnp.concatenate([oc for oc, _ in combos], axis=0)
        all_ok = jnp.concatenate([ok for _, ok in combos], axis=0)

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

        # gather inputs for each output site over the prod(K) taps
        in_lin = _linear_ids(c, grid, m)
        st = jnp.asarray(stride, jnp.int32)
        pad = jnp.asarray(padding, jnp.int32)

        def accumulate(carry, ow):
            off, w = ow
            nb = out_coords * st[None, :] - pad[None, :] + off[None, :]
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


def sparse_conv3d_downsample(feats, coords, valid, weights, grid, stride,
                             max_out):
    """Kernel-3/pad-1 strided sparse conv (the VoxelBackBone8x stage shape)."""
    return sparse_conv3d(feats, coords, valid, weights, grid,
                         kernel=3, stride=stride, padding=1, max_out=max_out)
