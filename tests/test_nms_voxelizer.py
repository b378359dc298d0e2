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


def _flagship_anchor_scene(rng, n_anchors, n_live, cluster=True):
    """Flagship-scale candidate set: boxes everywhere, n_live finite scores.

    ``cluster=True`` packs the live scores into a contiguous index block —
    the adversarial layout for any binned/approximate pre-selection (two
    live candidates in one reduction bin drop the lower one).
    """
    boxes = np.zeros((n_anchors, 7), dtype=np.float32)
    boxes[:, 0] = rng.uniform(0, 47, size=n_anchors)
    boxes[:, 1] = rng.uniform(-19, 19, size=n_anchors)
    boxes[:, 3:5] = rng.uniform(1.4, 4.2, size=(n_anchors, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, size=n_anchors)
    scores = np.full(n_anchors, -np.inf, np.float32)
    if cluster:
        start = rng.integers(0, n_anchors - n_live)
        live = np.arange(start, start + n_live)
    else:
        live = rng.choice(n_anchors, n_live, replace=False)
    scores[live] = rng.uniform(0.1, 1.0, n_live).astype(np.float32)
    return boxes, scores, live


def _kept_set(result, boxes):
    keep_idx, keep_mask, _ = result
    idx = np.asarray(keep_idx)[np.asarray(keep_mask)]
    # compare by box content (pre-selection may reorder equal-score ties)
    return {tuple(np.round(boxes[i], 5)) for i in idx}


def test_nms_preselect_exact_flagship():
    """VERDICT r4 #1: at flagship anchor counts (36,704/scan, hvpr.yaml head)
    the stage-1 kept set must equal exact-selection NMS — the pre-selection
    is exact lax.top_k (ops/nms.py _nms_topk), so no live candidate can be
    silently dropped regardless of how live scores cluster in index space.

    Oracle: NMS over ONLY the live candidates (compacted, no pre-selection
    at all) — exact by construction when n_live <= the oracle width.
    """
    rng = np.random.default_rng(123)
    n_anchors = 36704
    for n_live, cluster in ((512, True), (1024, True), (937, False)):
        boxes, scores, live = _flagship_anchor_scene(
            rng, n_anchors, n_live, cluster)

        got = nms.nms_bev_fixed(
            jnp.asarray(boxes), jnp.asarray(scores), 0.1,
            pre_maxsize=4096, post_maxsize=500, stage1=1024)

        # oracle: run single-stage NMS over the compacted live set only
        lb = np.zeros((1024, 7), np.float32)
        ls = np.full(1024, -np.inf, np.float32)
        lb[:n_live] = boxes[live]
        ls[:n_live] = scores[live]
        want = nms.nms_bev_fixed(
            jnp.asarray(lb), jnp.asarray(ls), 0.1,
            pre_maxsize=1024, post_maxsize=500, stage1=1024)

        got_set = _kept_set(got, boxes)
        want_set = _kept_set(want, lb)
        assert got_set == want_set, (
            f'n_live={n_live} cluster={cluster}: kept sets differ '
            f'({len(got_set)} vs {len(want_set)})')


def test_nms_preselect_exact_flagship_fallback():
    """Fallback branch (n_live > stage1) at flagship scale: the kept set must
    equal NMS over the EXACT top-pre_maxsize candidates (np.argsort oracle),
    matching the reference's torch.topk selection
    (model_nms_utils.py:13-14)."""
    rng = np.random.default_rng(321)
    n_anchors = 36704
    n_live = 2000
    boxes, scores, _ = _flagship_anchor_scene(rng, n_anchors, n_live)

    got = nms.nms_bev_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), 0.1,
        pre_maxsize=4096, post_maxsize=500, stage1=1024)

    top = np.argsort(-scores, kind='stable')[:4096]
    tb = boxes[top]
    ts = scores[top]
    want = nms.nms_bev_fixed(
        jnp.asarray(tb), jnp.asarray(ts), 0.1,
        pre_maxsize=4096, post_maxsize=500, stage1=4096)

    assert _kept_set(got, boxes) == _kept_set(want, tb)
