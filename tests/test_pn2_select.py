"""ops/pn2_select: streamed bucket-min ball query / 3-NN kernels.

Semantics contract (see the module docstring): with at most one point per
bucket (N <= 128) both kernels are EXACT — ball query matches the reference
first-nsample-by-index semantics and three_nn matches exact 3-NN — so the
exact regime is pinned against brute-force numpy oracles. The collision
regime (N > 128) is pinned against a numpy twin of the bucket semantics plus
in-radius/validity invariants. Kernels run in Pallas interpret mode (tests
are CPU); reference being replaced: the CUDA ball_query/three_nn of
pcdet/ops/pointnet2 (setup.py:79-109).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvpr_tpu.ops.pn2_select import (ball_query_bucket,
                                     ball_query_bucket_xla, three_nn_bucket)

_BIG = 1e30


@pytest.fixture(scope='module')
def small():
    rng = np.random.default_rng(0)
    b, n, s = 2, 128, 24
    xyz = rng.uniform(-3, 3, (b, n, 3)).astype(np.float32)
    centers = xyz[:, :s] + rng.normal(0, 0.2, (b, s, 3)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 100:] = False
    return b, n, s, xyz, centers, mask


def _oracle_ball(radius, nsample, xyz, new_xyz, mask):
    """Reference first-nsample-by-index semantics (exact when N <= 128)."""
    b, s = new_xyz.shape[:2]
    idx = np.zeros((b, s, nsample), np.int32)
    cnt = np.zeros((b, s), np.int32)
    for bi in range(b):
        for si in range(s):
            d2 = np.sum((xyz[bi] - new_xyz[bi, si]) ** 2, axis=-1)
            hits = np.where((d2 < radius * radius) & mask[bi])[0][:nsample]
            cnt[bi, si] = len(hits)
            if len(hits):
                row = np.full(nsample, hits[0], np.int32)
                row[:len(hits)] = hits
                idx[bi, si] = row
    return idx, cnt


def test_ball_query_exact_regime(small):
    b, n, s, xyz, centers, mask = small
    idx, cnt = ball_query_bucket(1.0, 8, jnp.asarray(xyz),
                                 jnp.asarray(centers), jnp.asarray(mask),
                                 interpret=True)
    oidx, ocnt = _oracle_ball(1.0, 8, xyz, centers, mask)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)
    np.testing.assert_array_equal(np.asarray(idx), oidx)


def test_ball_query_no_hits_is_zero(small):
    b, n, s, xyz, centers, mask = small
    far = centers + 100.0
    idx, cnt = ball_query_bucket(0.5, 8, jnp.asarray(xyz), jnp.asarray(far),
                                 jnp.asarray(mask), interpret=True)
    assert (np.asarray(cnt) == 0).all()
    assert (np.asarray(idx) == 0).all()


def test_ball_query_collision_regime_invariants():
    """N > 128: selected indices are valid in-radius points, are the
    lowest-index hit of their bucket, and buckets are the nsample
    lowest-first-hit nonempty ones (numpy twin of the kernel semantics)."""
    rng = np.random.default_rng(3)
    b, n, s, ns, r = 1, 1024, 16, 8, 1.2
    xyz = rng.uniform(-4, 4, (b, n, 3)).astype(np.float32)
    centers = rng.uniform(-3, 3, (b, s, 3)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[0, 900:] = False

    idx, cnt = ball_query_bucket(r, ns, jnp.asarray(xyz),
                                 jnp.asarray(centers), jnp.asarray(mask),
                                 interpret=True)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for si in range(s):
        d2 = np.sum((xyz[0] - centers[0, si]) ** 2, axis=-1)
        hit = (d2 < r * r) & mask[0]
        hits = np.where(hit)[0]
        # bucket twin: first hit per (i mod 128) bucket, nsample smallest
        first = {}
        for h in hits:
            first.setdefault(h % 128, h)
        want = np.sort(np.asarray(sorted(first.values())[:ns], np.int32))
        got = idx[0, si][:cnt[0, si]]
        assert cnt[0, si] == len(want)
        np.testing.assert_array_equal(np.sort(got), want)
        assert hit[got].all() if len(got) else True
        # backfill: padded slots repeat the first hit
        if cnt[0, si] and cnt[0, si] < ns:
            assert (idx[0, si][cnt[0, si]:] == idx[0, si][0]).all()


def test_ball_query_xla_twin_matches_kernel():
    """ball_query_bucket_xla reproduces the interpret-mode kernel EXACTLY,
    including the collision regime (N > 128, dense clusters guaranteeing
    many mod-128 bucket collisions) and padded tails (N not a multiple of
    128). This is what lets the AP-level A/B (test_round4_ap_ab.py) train
    under kernel semantics on the CPU test backend."""
    rng = np.random.default_rng(11)
    for n, s, ns, r in ((1024, 32, 8, 1.5), (700, 16, 16, 2.5)):
        b = 2
        # dense cluster: most points inside one ball -> heavy collisions
        xyz = rng.uniform(-2, 2, (b, n, 3)).astype(np.float32)
        centers = rng.uniform(-1, 1, (b, s, 3)).astype(np.float32)
        mask = np.ones((b, n), bool)
        mask[0, n - 50:] = False
        ki, kc = ball_query_bucket(r, ns, jnp.asarray(xyz),
                                   jnp.asarray(centers), jnp.asarray(mask),
                                   interpret=True)
        xi, xc = ball_query_bucket_xla(r, ns, jnp.asarray(xyz),
                                       jnp.asarray(centers),
                                       jnp.asarray(mask))
        np.testing.assert_array_equal(np.asarray(kc), np.asarray(xc))
        np.testing.assert_array_equal(np.asarray(ki), np.asarray(xi))
        assert int(np.asarray(kc).max()) == ns  # collisions actually occur


def test_three_nn_exact_regime(small):
    b, n, s, xyz, centers, mask = small
    # unknown = centers (any points), known = xyz (<=128 -> exact)
    dist, idx = three_nn_bucket(jnp.asarray(centers), jnp.asarray(xyz),
                                jnp.asarray(mask), interpret=True)
    dist, idx = np.asarray(dist), np.asarray(idx)
    for bi in range(b):
        d2 = np.sum((centers[bi][:, None] - xyz[bi][None]) ** 2, axis=-1)
        d2[:, ~mask[bi]] = 1e10
        order = np.argsort(d2, axis=-1)[:, :3]
        np.testing.assert_array_equal(np.sort(idx[bi], -1),
                                      np.sort(order, -1))
        np.testing.assert_allclose(
            np.sort(dist[bi], -1) ** 2,
            np.sort(np.take_along_axis(d2, order, -1), -1), rtol=1e-4,
            atol=1e-5)


def test_three_nn_collision_regime_quality():
    """N > 128: returned neighbors are valid, distances are sorted-ish
    bucket minima, and the nearest neighbor is always EXACT (the true 1-NN
    is its bucket's minimum by definition)."""
    rng = np.random.default_rng(5)
    b, n, q = 1, 512, 32
    known = rng.uniform(-4, 4, (b, n, 3)).astype(np.float32)
    unknown = rng.uniform(-4, 4, (b, q, 3)).astype(np.float32)
    mask = np.ones((b, n), bool)
    dist, idx = three_nn_bucket(jnp.asarray(unknown), jnp.asarray(known),
                                jnp.asarray(mask), interpret=True)
    dist, idx = np.asarray(dist), np.asarray(idx)
    d2 = np.sum((unknown[0][:, None] - known[0][None]) ** 2, axis=-1)
    # 1-NN exact (up to f32 accumulation-order rounding)
    np.testing.assert_allclose(dist[0].min(-1) ** 2,
                               d2.min(-1).astype(np.float32),
                               rtol=1e-5, atol=1e-6)
    # every returned idx achieves its returned distance
    got_d2 = np.take_along_axis(d2, idx[0], -1)
    np.testing.assert_allclose(dist[0] ** 2, got_d2, rtol=1e-4, atol=1e-5)
    # 2nd/3rd within 2x of the true 2nd/3rd (bucket collisions only swap
    # in the next-nearest out-of-bucket point)
    true3 = np.sort(d2, axis=-1)[:, :3]
    assert (np.sort(dist[0], -1) ** 2 <= 4.0 * true3 + 1e-4).all()


def test_three_nn_stop_gradient(small):
    b, n, s, xyz, centers, mask = small
    g = jax.grad(lambda u: three_nn_bucket(
        u, jnp.asarray(xyz), jnp.asarray(mask), interpret=True)[0].sum())(
            jnp.asarray(centers))
    assert np.abs(np.asarray(g)).max() == 0.0


def test_ball_query_padding_alignment():
    """Non-multiple-of-128 support size: padded lanes never get selected."""
    rng = np.random.default_rng(7)
    b, n, s = 1, 200, 8          # pads to 256
    xyz = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    centers = xyz[:, :s]
    mask = np.ones((b, n), bool)
    idx, cnt = ball_query_bucket(5.0, 16, jnp.asarray(xyz),
                                 jnp.asarray(centers), jnp.asarray(mask),
                                 interpret=True)
    assert (np.asarray(idx) < n).all()
    assert (np.asarray(cnt) > 0).all()


def test_fps_chunks_pallas_matches_xla_loop():
    """fps_chunks_pallas (interpret) == the vmapped _fps_one XLA loop on
    every chunk that contains at least one valid point (all-invalid chunks'
    outputs are replaced by the caller's fallback and may differ)."""
    import jax.numpy as jnp
    from hvpr_tpu.ops.pn2_select import fps_chunks_pallas
    from hvpr_tpu.ops.pointnet2 import _fps_one

    rng = np.random.default_rng(11)
    r, l, s = 6, 64, 16
    pts = rng.uniform(-10, 10, (r, l, 3)).astype(np.float32)
    valid = np.ones((r, l), bool)
    valid[2, 40:] = False            # partial chunk
    valid[5, :] = False              # fully invalid chunk

    got = np.asarray(fps_chunks_pallas(jnp.asarray(pts), jnp.asarray(valid),
                                       s, interpret=True))
    want = np.asarray(jax.vmap(lambda p, m: _fps_one(p, m, s))(
        jnp.asarray(pts), jnp.asarray(valid)))
    np.testing.assert_array_equal(got[:5], want[:5])
