"""NMS vs a sequential greedy oracle; voxelizer device/host parity."""

import numpy as np
import jax.numpy as jnp

from hvpr_tpu.ops import nms, rotated_iou, voxelizer


def greedy_nms_oracle(boxes, scores, thresh):
    order = np.argsort(-scores, kind='stable')
    iou = np.asarray(rotated_iou.boxes_iou_bev_jit(jnp.asarray(boxes), jnp.asarray(boxes)))
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if scores[i] == -np.inf or suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j != i and iou[i, j] > thresh:
                suppressed[j] = True
    return keep


def test_nms_matches_greedy_oracle():
    rng = np.random.default_rng(42)
    n = 200
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(0, 30, size=(n, 2))
    boxes[:, 2] = 0.0
    boxes[:, 3:5] = rng.uniform(1.0, 4.5, size=(n, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, size=n)
    scores = rng.uniform(0, 1, size=n).astype(np.float32)

    keep_idx, keep_mask, _ = nms.nms_bev_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), 0.1, pre_maxsize=256, post_maxsize=100)
    got = list(np.asarray(keep_idx)[np.asarray(keep_mask)])
    want = greedy_nms_oracle(boxes, scores, 0.1)
    assert got == want[:100], (got[:10], want[:10])


def test_nms_with_padding():
    boxes = np.zeros((16, 7), dtype=np.float32)
    boxes[0] = [0, 0, 0, 2, 2, 2, 0]
    boxes[1] = [0.5, 0, 0, 2, 2, 2, 0]   # overlaps box 0
    boxes[2] = [20, 20, 0, 2, 2, 2, 0.5]
    scores = np.full(16, -np.inf, dtype=np.float32)
    scores[0], scores[1], scores[2] = 0.9, 0.8, 0.7

    keep_idx, keep_mask, _ = nms.nms_bev_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), 0.1, pre_maxsize=16, post_maxsize=8)
    got = list(np.asarray(keep_idx)[np.asarray(keep_mask)])
    assert got == [0, 2]


def make_points(rng, n=500):
    pts = np.zeros((n, 4), dtype=np.float32)
    pts[:, 0] = rng.uniform(0, 47, size=n)
    pts[:, 1] = rng.uniform(-19, 19, size=n)
    pts[:, 2] = rng.uniform(-2.4, 0.4, size=n)
    pts[:, 3] = rng.uniform(0, 1, size=n)
    return pts


def test_voxelizer_device_host_agree():
    rng = np.random.default_rng(3)
    pcr = [0, -19.84, -2.5, 47.36, 19.84, 0.5]
    vsz = [0.16, 0.16, 3.0]
    pts = make_points(rng)

    gen = voxelizer.VoxelGeneratorNumpy(vsz, pcr, max_num_points=32, max_voxels=16000)
    v_host, c_host, n_host = gen.generate(pts)

    out = voxelizer.voxelize_jax(
        jnp.asarray(pts), jnp.ones(len(pts), dtype=bool), tuple(pcr), tuple(vsz),
        max_voxels=16000, max_points_per_voxel=32, grid_size_static=tuple(int(g) for g in gen.grid_size))
    v_dev = np.asarray(out['voxels'])
    c_dev = np.asarray(out['voxel_coords'])
    n_dev = np.asarray(out['voxel_num_points'])
    mask = np.asarray(out['voxel_mask'])

    assert mask.sum() == len(c_host)  # same number of occupied pillars

    # compare per-pillar contents keyed by grid coords (ordering differs by design)
    def keyed(voxels, coords, counts):
        d = {}
        for v, c, n in zip(voxels, coords, counts):
            if n == 0:
                continue
            pts_sorted = v[:n][np.lexsort(v[:n].T)]
            d[tuple(c)] = (int(n), pts_sorted)
        return d

    host = keyed(v_host, c_host, n_host)
    dev = keyed(v_dev[mask], c_dev[mask], n_dev[mask])
    assert set(host) == set(dev)
    for k in host:
        assert host[k][0] == dev[k][0], k
        np.testing.assert_allclose(host[k][1], dev[k][1], atol=1e-6)


def test_voxelizer_batched_matches_vmapped():
    import jax
    rng = np.random.default_rng(5)
    pcr = (0.0, -19.84, -2.5, 47.36, 19.84, 0.5)
    vsz = (0.16, 0.16, 3.0)
    grid = (296, 248, 1)
    b, n = 3, 700
    pts = np.stack([make_points(rng, n) for _ in range(b)])
    mask = rng.uniform(size=(b, n)) > 0.1

    ref = jax.vmap(lambda p, m: voxelizer.voxelize_jax(
        p, m, pcr, vsz, max_voxels=512, max_points_per_voxel=8,
        grid_size_static=grid))(jnp.asarray(pts), jnp.asarray(mask))
    got = voxelizer.voxelize_batch_jax(
        jnp.asarray(pts), jnp.asarray(mask), pcr, vsz,
        max_voxels=512, max_points_per_voxel=8, grid_size_static=grid)

    for k in ['voxels', 'voxel_coords', 'voxel_num_points', 'voxel_mask']:
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]), err_msg=k)


def test_voxelizer_large_grid_no_key_overflow():
    """SECOND-scale 92M-cell grid at batch 24: batch*(cells+1) > 2^31.

    Regression: the fused sort key used to be int32 batch*(cells+1)+pid,
    which wrapped negative past batch 23 and silently interleaved samples;
    the two-key (batch, pid) sort has no combined arithmetic to overflow."""
    pcr = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    vsz = (0.05, 0.05, 0.1)
    grid = (1408, 1600, 40)  # 90.1M cells; 24 * (cells+1) ~ 2.16e9 > 2^31
    b, n = 24, 16
    rng = np.random.default_rng(9)
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.1, 70.0, (b, n))
    pts[..., 1] = rng.uniform(-39.9, 39.9, (b, n))
    pts[..., 2] = rng.uniform(-2.9, 0.9, (b, n))
    mask = np.ones((b, n), bool)

    got = voxelizer.voxelize_batch_jax(
        jnp.asarray(pts), jnp.asarray(mask), pcr, vsz,
        max_voxels=n, max_points_per_voxel=4, grid_size_static=grid)

    # every sample's voxel coords must reproduce its own points' cells
    for s in range(b):
        exp = {tuple(np.floor((p[:3] - np.array(pcr[:3])) /
                              np.array(vsz)).astype(int)[::-1])
               for p in pts[s]}
        vm = np.asarray(got['voxel_mask'][s])
        coords = {tuple(c) for c in np.asarray(got['voxel_coords'][s])[vm]}
        assert coords == exp, s


def test_voxelizer_point_cap():
    # 100 identical points -> single voxel capped at max_num_points
    pts = np.tile(np.array([[1.0, 0.0, -1.0, 0.5]], dtype=np.float32), (100, 1))
    pcr = [0, -19.84, -2.5, 47.36, 19.84, 0.5]
    gen = voxelizer.VoxelGeneratorNumpy([0.16, 0.16, 3.0], pcr, max_num_points=32, max_voxels=100)
    v, c, n = gen.generate(pts)
    assert v.shape[0] == 1 and n[0] == 32

    out = voxelizer.voxelize_jax(
        jnp.asarray(pts), jnp.ones(100, dtype=bool), tuple(pcr), (0.16, 0.16, 3.0),
        max_voxels=100, max_points_per_voxel=32, grid_size_static=tuple(int(g) for g in gen.grid_size))
    assert int(np.asarray(out['voxel_mask']).sum()) == 1
    assert int(np.asarray(out['voxel_num_points'])[0]) == 32


def test_nms_post_maxsize_cap_is_counted():
    """>post_maxsize disjoint survivors: cap drops the tail but reports it."""
    n = 24
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0] = np.arange(n) * 10.0            # disjoint: nothing suppressed
    boxes[:, 3:6] = 2.0
    scores = np.linspace(0.9, 0.1, n).astype(np.float32)

    keep_idx, keep_mask, num_kept = nms.nms_bev_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), 0.1,
        pre_maxsize=32, post_maxsize=8)
    assert int(num_kept) == n                    # survivors before the cap
    kept = np.asarray(keep_idx)[np.asarray(keep_mask)]
    assert len(kept) == 8                        # capped output
    # the cap keeps the HIGHEST-scoring survivors
    assert list(kept) == list(np.arange(8))


def test_nms_score_thresh_boundary():
    """Scores exactly at SCORE_THRESH survive (>= semantics); below do not."""
    from hvpr_tpu.models.model_utils.model_nms_utils import class_agnostic_nms
    boxes = np.zeros((4, 7), dtype=np.float32)
    boxes[:, 0] = np.arange(4) * 10.0
    boxes[:, 3:6] = 2.0
    scores = np.array([0.5, 0.1, 0.0999, 0.3], dtype=np.float32)

    keep_idx, keep_mask, num_kept = class_agnostic_nms(
        jnp.asarray(scores), jnp.asarray(boxes),
        {'NMS_THRESH': 0.1, 'NMS_PRE_MAXSIZE': 4, 'NMS_POST_MAXSIZE': 4},
        score_thresh=0.1)
    kept = sorted(np.asarray(keep_idx)[np.asarray(keep_mask)])
    assert kept == [0, 1, 3]
    assert int(num_kept) == 3


def test_nms_hierarchical_small_branch_equals_single_stage():
    """stage1 < pre_maxsize with few live scores: the cheap branch must be
    bit-exact vs the single-stage run at full pre_maxsize (ops/nms.py module
    docstring — the reference NMS_PRE_MAXSIZE=4096 contract)."""
    rng = np.random.default_rng(7)
    n = 200
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(0, 30, size=(n, 2))
    boxes[:, 3:5] = rng.uniform(1.0, 4.5, size=(n, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, size=n)
    scores = np.full(n, -np.inf, np.float32)
    live = rng.choice(n, 20, replace=False)
    scores[live] = rng.uniform(0.2, 1.0, 20)

    full = nms.nms_bev_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.1,
                             pre_maxsize=128, post_maxsize=50, stage1=128)
    hier = nms.nms_bev_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.1,
                             pre_maxsize=128, post_maxsize=50, stage1=32)
    for a, b in zip(full, hier):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nms_hierarchical_fallback_branch():
    """More live scores than stage1: the cond must take the full branch and
    match the single-stage result."""
    rng = np.random.default_rng(8)
    n = 200
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(0, 60, size=(n, 2))
    boxes[:, 3:5] = rng.uniform(1.0, 4.5, size=(n, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, size=n)
    scores = rng.uniform(0, 1, size=n).astype(np.float32)  # all live

    full = nms.nms_bev_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.1,
                             pre_maxsize=128, post_maxsize=50, stage1=128)
    hier = nms.nms_bev_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.1,
                             pre_maxsize=128, post_maxsize=50, stage1=32)
    for a, b in zip(full, hier):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
