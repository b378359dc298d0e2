"""Regressions for padding-mask and determinism fixes (round-3 review).

1. ATSS per-gt force match is deterministic when two gts share a best anchor
   (reference advanced-index assignment is last-write-wins on CPU torch —
   the highest gt index claims the anchor).
2. attentive_point_pooling with fewer than k valid points must not leak
   padded rows into the aggregation softmax or the memory inputs.
3. MaskedBatchNorm stores the unbiased (n-1) running variance, exactly as
   torch BatchNorm does (torch parity-tested).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hvpr_tpu.models.backbones_2d.map_to_bev.memory_module import MemoryUnitAgg
from hvpr_tpu.models.backbones_2d.map_to_bev.pointpillar_scatter import (
    attentive_point_pooling,
)
from hvpr_tpu.models.dense_heads.target_assigner.atss_target_assigner import (
    ATSSTargetAssigner,
)
from hvpr_tpu.models.model_utils.layers import MaskedBatchNorm
from hvpr_tpu.utils.box_coder_utils import ResidualCoder


def test_atss_force_match_collision_is_deterministic():
    """Two gts with the same best anchor: the highest gt index wins
    (reference: anchors_to_gt_indexs[argmax_iou_of_each_gt] = arange(M),
    torch CPU duplicate-index assignment is last-write-wins)."""
    anchors = np.zeros((1, 6, 6, 1, 1, 7), np.float32)
    xs = np.arange(6) * 2.0
    anchors[0, :, :, 0, 0, 0] = xs[None, :]
    anchors[0, :, :, 0, 0, 1] = xs[:, None]
    anchors[..., 3:6] = [3.9, 1.6, 1.56]

    # identical boxes, different classes -> identical IoU rows, same best anchor
    gt = np.array([[[4.0, 4.0, 0.0, 3.9, 1.6, 1.56, 0.0, 1],
                    [4.0, 4.0, 0.0, 3.9, 1.6, 1.56, 0.0, 2]]], np.float32)
    assigner = ATSSTargetAssigner(topk=9, box_coder=ResidualCoder())
    labels = np.asarray(
        assigner.assign_targets([anchors], jnp.asarray(gt))['box_cls_labels'][0])
    assert labels.reshape(6, 6)[2, 2] == 2  # gt index 1 (class 2) wins
    # and it is stable across invocations
    labels2 = np.asarray(
        assigner.assign_targets([anchors], jnp.asarray(gt))['box_cls_labels'][0])
    np.testing.assert_array_equal(labels, labels2)


def test_attentive_pooling_excludes_padded_points():
    """A sample with < k valid points: padded rows get zero aggregation
    weight, zeroed features, and topk_valid=False."""
    rng = np.random.default_rng(0)
    n, v, c, k = 8, 4, 6, 5
    points = rng.normal(size=(1, n, c)).astype(np.float32)
    pillars = rng.normal(size=(1, v, c)).astype(np.float32)
    mask = np.zeros((1, n), bool)
    mask[0, :3] = True  # only 3 valid points, k=5

    out, idx, valid = attentive_point_pooling(
        jnp.asarray(points), jnp.asarray(mask), jnp.asarray(pillars), k, chunk=4)
    out, idx, valid = np.asarray(out), np.asarray(idx), np.asarray(valid)

    assert valid.shape == (1, v, k)
    assert valid.sum(axis=-1).tolist() == [[3] * v]  # exactly the 3 valid rows
    # valid slots index only real points; the valid mask marks exactly the
    # slots whose selected point is a valid one
    assert (idx[valid] < 3).all()
    assert (idx[~valid] >= 3).all()

    # manual oracle over the 3 valid points only
    val_pts = points[0, :3]                                   # (3, C)
    for j in range(v):
        logits = val_pts @ pillars[0, j]
        w = np.exp(logits - logits.max())
        w /= w.sum()
        np.testing.assert_allclose(out[0, j], w @ val_pts, rtol=1e-5, atol=1e-5)


def test_attentive_pooling_all_invalid_is_zero():
    n, v, c, k = 8, 4, 6, 3
    rng = np.random.default_rng(1)
    points = rng.normal(size=(1, n, c)).astype(np.float32)
    pillars = rng.normal(size=(1, v, c)).astype(np.float32)
    mask = np.zeros((1, n), bool)
    out, idx, valid = attentive_point_pooling(
        jnp.asarray(points), jnp.asarray(mask), jnp.asarray(pillars), k, chunk=4)
    assert not np.asarray(valid).any()
    assert (np.asarray(out) == 0).all()


def test_memory_aggregation_masks_invalid_candidates():
    """train_forward with a fully-invalid pillar aggregates to exactly zero;
    partially-invalid pillars match the oracle over valid slots only."""
    mem = MemoryUnitAgg(mem_dim=16, fea_dim=6, shrink_thres=0.0)
    rng = np.random.default_rng(2)
    pillars = rng.normal(size=(1, 2, 6)).astype(np.float32)
    points = rng.normal(size=(1, 5, 6)).astype(np.float32)
    idx = np.array([[[0, 2, 4], [1, 3, 4]]], np.int32)
    valid = np.array([[[True, True, False], [False, False, False]]])

    vars_ = mem.init(jax.random.PRNGKey(0), jnp.asarray(pillars), 2)
    out = mem.apply(vars_, jnp.asarray(pillars), jnp.asarray(points),
                    jnp.asarray(idx), jnp.asarray(valid),
                    method=MemoryUnitAgg.train_forward)
    out = np.asarray(out['output'])
    assert (out[0, 1] == 0).all()
    assert np.abs(out[0, 0]).sum() > 0


def test_train_forward_dedup_matches_gather_then_recon():
    """Round-4 restructure: train_forward reconstructs each point ONCE and
    gathers the results (recon is row-wise, so recon-then-gather ==
    gather-then-recon, the reference's order memory_module.py:37-49). The
    output must match an oracle that gathers features per (pillar, k) slot
    first and reconstructs the duplicated rows."""
    from hvpr_tpu.ops.memory_recon import memory_recon

    mem = MemoryUnitAgg(mem_dim=16, fea_dim=6, shrink_thres=0.0025)
    rng = np.random.default_rng(4)
    b, n, v, k, c = 2, 9, 4, 3, 6
    pillars = jnp.asarray(rng.normal(size=(b, v, c)).astype(np.float32))
    points = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(b, v, k)).astype(np.int32))
    valid = jnp.asarray(rng.uniform(size=(b, v, k)) > 0.3)

    vars_ = mem.init(jax.random.PRNGKey(0), pillars, 2)
    new = mem.apply(vars_, pillars, points, idx, valid,
                    method=MemoryUnitAgg.train_forward)['output']

    # oracle: reference order — gather the (B, V, k, C) features, then
    # reconstruct every duplicated row, then the same aggregation
    w = vars_['params']['weight']
    feats = jnp.take_along_axis(points[:, None, :, :], idx[..., None], axis=2)
    recon = memory_recon(feats.reshape(-1, c), w,
                         shrink_thres=0.0025).reshape(b, v, k, c)
    want = mem.apply(vars_, recon, pillars, None, valid,
                     method=MemoryUnitAgg._aggregate)

    np.testing.assert_allclose(np.asarray(new), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_masked_batchnorm_running_var_matches_torch():
    """Running stats parity with torch BatchNorm1d(eps=1e-3, momentum=0.01):
    torch normalizes with biased batch var but stores the UNBIASED one."""
    torch = __import__('torch')
    rng = np.random.default_rng(3)
    x = rng.normal(loc=2.0, scale=3.0, size=(5, 4)).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(4, eps=1e-3, momentum=0.01)
    tbn.train()
    ty = tbn(torch.from_numpy(x)).detach().numpy()

    bn = MaskedBatchNorm()
    vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                    jnp.ones((5,), bool), train=True)
    y, mutated = bn.apply(vars_, jnp.asarray(x), jnp.ones((5,), bool),
                          train=True, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mutated['batch_stats']['mean']),
        tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mutated['batch_stats']['var']),
        tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)
