"""Chunk-parallel ("serialized") FPS: semantics + coverage vs exact FPS.

The chunked variant (ops/pointnet2.furthest_point_sample num_chunks>1) trades
exactness for ~G x less sequential depth; these tests pin its contract:
valid-only sampling, uniqueness, index mapping, and a fill-distance (coverage)
bound relative to the exact algorithm.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hvpr_tpu.ops.pointnet2 import furthest_point_sample


def _fill_distance(pts, sample_idx):
    """Max over points of the distance to the nearest sampled point."""
    s = pts[sample_idx]                          # (S, 3)
    d = np.linalg.norm(pts[:, None, :] - s[None, :, :], axis=-1).min(axis=1)
    return d.max()


@pytest.mark.parametrize('chunks', [4, 16])
def test_chunked_fps_validity_and_uniqueness(chunks):
    rng = np.random.default_rng(0)
    n, npoint = 1024, 256
    pts = rng.uniform(-20, 20, (2, n, 3)).astype(np.float32)
    mask = np.ones((2, n), bool)
    mask[1, n // 2:] = False                     # half the points invalid

    idx = np.asarray(furthest_point_sample(
        jnp.asarray(pts), jnp.asarray(mask), npoint, num_chunks=chunks))
    assert idx.shape == (2, npoint)
    # fully-valid sample: all indices unique and valid
    assert len(np.unique(idx[0])) == npoint
    # half-masked scan: every sample still points at a valid point (invalid
    # chunk samples are repeat-filled, the exact-FPS contract)
    assert mask[1][idx[1]].all()


def test_chunked_fps_coverage_close_to_exact():
    rng = np.random.default_rng(1)
    n, npoint = 2048, 512
    # clustered cloud (worst-ish case for chunking): gaussian blobs on a ring
    centers = rng.uniform(-30, 30, (12, 3)).astype(np.float32)
    pts = (centers[rng.integers(0, 12, n)]
           + rng.normal(0, 2.0, (n, 3))).astype(np.float32)
    mask = np.ones((1, n), bool)
    batch = jnp.asarray(pts[None])

    exact = np.asarray(furthest_point_sample(
        batch, jnp.asarray(mask), npoint, num_chunks=1))[0]
    chunked = np.asarray(furthest_point_sample(
        batch, jnp.asarray(mask), npoint, num_chunks=16))[0]

    fd_exact = _fill_distance(pts, exact)
    fd_chunked = _fill_distance(pts, chunked)
    # chunked coverage within 1.5x of the exact farthest-point fill distance
    assert fd_chunked <= 1.5 * fd_exact + 1e-3, (fd_exact, fd_chunked)


def test_chunked_fps_falls_back_when_indivisible():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 1, (1, 300, 3)).astype(np.float32)  # 300 % 16 != 0
    mask = np.ones((1, 300), bool)
    idx = np.asarray(furthest_point_sample(
        jnp.asarray(pts), jnp.asarray(mask), 75, num_chunks=16))
    assert idx.shape == (1, 75)
    assert len(np.unique(idx[0])) == 75
