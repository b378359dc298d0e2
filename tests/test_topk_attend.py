"""ops/topk_attend: fused top-k-masked attention for the training path.

Covers (a) the bucket threshold against the exact k-th largest score in the
one-point-per-bucket regime (N == 128 buckets => per-bucket max IS the
score, so the threshold is exactly the k-th largest), (b) the masked-attend
forward against a dense numpy oracle (shared and split variants), (c) the
custom-VJP gradient topology (val table only; pillars get zero), (d) Pallas
interpret-mode parity with the XLA emulation, and (e) module-level parity:
PointPillarScatterAggMemory1Scale TRAIN_ATTEND_MODE='fused' vs 'gather'
(rounds 1-3 path) on bf16-exact inputs where both paths select the same set.

Reference semantics being preserved:
/root/reference/pcdet/models/backbones_2d/map_to_bev/pointpillar_scatter.py:67-83
(get_score) and memory_module.py:53-57 (aggregation over the same top-k set).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvpr_tpu.ops.topk_attend import bucket_threshold, masked_attend


@pytest.fixture(scope='module')
def small():
    # bf16-EXACT inputs (multiples of 1/8 in [-4, 4)): selection scores and
    # thresholds are then computed exactly by every lowering (f32 accumulate
    # of exact products), so boundary membership (s >= th with th == the
    # k-th score itself) cannot flip on 1-ulp accumulation-order differences
    # between the Pallas kernels, the XLA emulation, and the numpy oracle.
    rng = np.random.default_rng(0)
    b, v, n, c, k = 2, 10, 128, 6, 4   # N=128 -> threshold == exact kth
    pillars = (rng.integers(-32, 32, size=(b, v, c)) / 8.0).astype(np.float32)
    points = (rng.integers(-32, 32, size=(b, n, c)) / 8.0).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[0, 100:] = False
    neg = np.where(mask, 0.0, -1e30).astype(np.float32)
    return b, v, n, c, k, pillars, points, mask, neg


def _bf16(x):
    return np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))


def test_bucket_threshold_exact_regime(small):
    b, v, n, c, k, pillars, points, mask, neg = small
    th = bucket_threshold(jnp.asarray(pillars), jnp.asarray(points),
                          jnp.asarray(neg), k)
    assert th.shape == (b, v)
    # oracle in the SAME precision as the kernel's scores (bf16 operands,
    # f32 accumulate)
    s = np.einsum('bvc,bnc->bvn', _bf16(pillars), _bf16(points)) + neg[:, None]
    kth = np.sort(s, axis=-1)[..., -k]
    np.testing.assert_allclose(np.asarray(th), kth, rtol=1e-5, atol=1e-5)


def _oracle_attend(pillars, points, vals, mask, neg, th, shared):
    """Dense numpy oracle: softmax over {score >= th, valid} rows."""
    b, v, _ = pillars.shape
    s = np.einsum('bvc,bnc->bvn', _bf16(pillars), _bf16(points)) + neg[:, None]
    logits = s if shared else np.einsum('bvc,bnc->bvn', _bf16(pillars),
                                        _bf16(vals))
    out = np.zeros((b, v, vals.shape[-1]), np.float32)
    for bi in range(b):
        for vi in range(v):
            sel = (s[bi, vi] >= th[bi, vi]) & mask[bi]
            if not sel.any():
                continue
            l = logits[bi, vi][sel]
            w = np.exp(l - l.max())
            w /= w.sum()
            out[bi, vi] = w @ vals[bi][sel]
    return out


def test_masked_attend_shared_matches_oracle(small):
    b, v, n, c, k, pillars, points, mask, neg = small
    pj, tj, nj = jnp.asarray(pillars), jnp.asarray(points), jnp.asarray(neg)
    th = bucket_threshold(pj, tj, nj, k)
    out = masked_attend(pj, tj, tj, nj, th, shared=True)
    want = _oracle_attend(pillars, points, points, mask, neg,
                          np.asarray(th), shared=True)
    np.testing.assert_allclose(np.asarray(out), want, rtol=3e-2, atol=3e-2)


def test_masked_attend_split_matches_oracle(small):
    b, v, n, c, k, pillars, points, mask, neg = small
    rng = np.random.default_rng(7)
    vals = rng.normal(size=(b, n, c)).astype(np.float32)
    pj, tj, nj = jnp.asarray(pillars), jnp.asarray(points), jnp.asarray(neg)
    th = bucket_threshold(pj, tj, nj, k)
    out = masked_attend(pj, tj, jnp.asarray(vals), nj, th, shared=False)
    want = _oracle_attend(pillars, points, vals, mask, neg,
                          np.asarray(th), shared=False)
    np.testing.assert_allclose(np.asarray(out), want, rtol=3e-2, atol=3e-2)


def test_masked_attend_all_invalid_is_zero(small):
    b, v, n, c, k, pillars, points, mask, neg = small
    pj, tj = jnp.asarray(pillars), jnp.asarray(points)
    neg2 = jnp.full((b, n), -1e30, jnp.float32)
    th = bucket_threshold(pj, tj, neg2, k)
    out = masked_attend(pj, tj, tj, neg2, th, shared=True)
    assert (np.asarray(out) == 0).all()


def test_masked_attend_grad_topology(small):
    """d_val[n] = sum_v w[v, n] * d_out[v]; pillars/sel get exactly zero."""
    b, v, n, c, k, pillars, points, mask, neg = small
    rng = np.random.default_rng(8)
    vals = rng.normal(size=(b, n, c)).astype(np.float32)
    pj, tj, nj = jnp.asarray(pillars), jnp.asarray(points), jnp.asarray(neg)
    vj = jnp.asarray(vals)
    th = bucket_threshold(pj, tj, nj, k)

    g = jax.grad(
        lambda v_: masked_attend(pj, tj, v_, nj, th, shared=False).sum())(vj)
    # manual: w^T @ ones
    s = np.einsum('bvc,bnc->bvn', _bf16(pillars), _bf16(points)) + neg[:, None]
    l_all = np.einsum('bvc,bnc->bvn', _bf16(pillars), _bf16(vals))
    th_np = np.asarray(th)
    gw = np.zeros_like(vals)
    for bi in range(b):
        for vi in range(v):
            sel = (s[bi, vi] >= th_np[bi, vi]) & mask[bi]
            l = l_all[bi, vi][sel]
            w = np.exp(l - l.max())
            w /= w.sum()
            gw[bi][sel] += w[:, None]
    np.testing.assert_allclose(np.asarray(g), gw, rtol=3e-2, atol=3e-2)

    gp = jax.grad(
        lambda p: masked_attend(p, tj, vj, nj, th, shared=False).sum())(pj)
    assert np.abs(np.asarray(gp)).max() == 0.0


@pytest.mark.parametrize('shared', [True, False])
def test_pallas_interpret_parity(small, shared):
    """The TPU kernels (interpret mode) match the XLA emulation, fwd + bwd."""
    b, v, n, c, k, pillars, points, mask, neg = small
    rng = np.random.default_rng(9)
    vals = points if shared else rng.normal(size=(b, n, c)).astype(np.float32)
    pj, tj, nj = jnp.asarray(pillars), jnp.asarray(points), jnp.asarray(neg)
    vj = jnp.asarray(vals)

    th_i = bucket_threshold(pj, tj, nj, k, interpret=True)
    th_e = bucket_threshold(pj, tj, nj, k)
    np.testing.assert_allclose(np.asarray(th_i), np.asarray(th_e),
                               rtol=1e-5, atol=1e-5)

    # tolerance = one bf16 ulp (2^-8 relative): the kernels and the
    # emulation accumulate the softmax denominator in different orders, and
    # both quantize the weights to bf16 for the value matmul — a 1-ulp f32
    # difference in w can legitimately flip its bf16 rounding
    o_i = masked_attend(pj, tj, vj, nj, th_i, shared=shared, interpret=True)
    o_e = masked_attend(pj, tj, vj, nj, th_e, shared=shared)
    np.testing.assert_allclose(np.asarray(o_i), np.asarray(o_e),
                               rtol=1e-2, atol=1e-2)

    g_i = jax.grad(lambda v_: masked_attend(
        pj, tj, v_, nj, th_i, shared=shared, interpret=True).sum())(vj)
    g_e = jax.grad(lambda v_: masked_attend(
        pj, tj, v_, nj, th_e, shared=shared).sum())(vj)
    np.testing.assert_allclose(np.asarray(g_i), np.asarray(g_e),
                               rtol=1e-2, atol=1e-2)


# ---------------------------------------------------------------------------
# module-level: TRAIN_ATTEND_MODE 'fused' vs 'gather'
# ---------------------------------------------------------------------------


def _quantized(rng, shape):
    """bf16-exact values (multiples of 1/8 in [-4, 4)): both paths then
    compute IDENTICAL selection scores (f32 accumulate of exact operands),
    so fused-superset == gather-exact-k whenever there are no boundary
    ties (asserted in the fixture)."""
    return (rng.integers(-32, 32, size=shape) / 8.0).astype(np.float32)


@pytest.fixture(scope='module')
def module_fixture():
    rng = np.random.default_rng(11)
    b, v, n, c, cs, k = 2, 12, 128, 8, 4, 5
    ny, nx = 6, 8
    pillars = _quantized(rng, (b, v, c))
    points = _quantized(rng, (b, n, c))
    pmask = np.ones((b, n), bool)
    pmask[1, 120:] = False
    neg = np.where(pmask, 0.0, -1e30)
    # no tie at the k-th boundary for any pillar (else superset != exact-k)
    s = np.einsum('bvc,bnc->bvn', pillars, points) + neg[:, None]
    srt = np.sort(s, axis=-1)
    assert (srt[..., -k] > srt[..., -k - 1]).all(), 'reroll fixture seed'

    scale = _quantized(rng, (b, v, cs))
    coords = np.stack([rng.integers(0, ny, (b, v)),
                       rng.integers(0, nx, (b, v))], -1).astype(np.int32)
    vmask = np.ones((b, v), bool)
    batch = dict(
        pillar_features=jnp.asarray(pillars),
        pillar_scale_features=jnp.asarray(scale),
        voxel_coords=jnp.asarray(coords),
        voxel_mask=jnp.asarray(vmask),
        point_features=jnp.asarray(points),
        point_valid_mask=jnp.asarray(pmask),
    )
    return batch, (b, v, n, c, k, ny, nx)


def _build_scatter(mode, k, c, ny, nx):
    from hvpr_tpu.models.backbones_2d.map_to_bev.pointpillar_scatter import (
        PointPillarScatterAggMemory1Scale,
    )
    cfg = {'NUM_M': 16, 'NUM_PT_FEATURES': c, 'SHRINK_TH': 0.0025,
           'NUM_K': k, 'TRAIN_ATTEND_MODE': mode}
    return PointPillarScatterAggMemory1Scale(
        model_cfg=cfg, grid_size=(nx, ny, 1))


def test_module_fused_matches_gather(module_fixture):
    batch, (b, v, n, c, k, ny, nx) = module_fixture
    outs = {}
    for mode in ('gather', 'fused'):
        mod = _build_scatter(mode, k, c, ny, nx)
        vars_ = mod.init(jax.random.PRNGKey(0), dict(batch), train=True)
        outs[mode] = mod.apply(vars_, dict(batch), train=True)
    for key in ('spatial_features', 'spatial_features_point',
                'spatial_scale_features', 'point_positive_features',
                'memory_positive_features'):
        np.testing.assert_allclose(
            np.asarray(outs['fused'][key]), np.asarray(outs['gather'][key]),
            rtol=2e-2, atol=2e-2, err_msg=key)


def test_module_fused_matches_gather_grads(module_fixture):
    """Gradients wrt the point features and the memory weight agree between
    the two lowerings (same selection set, same stop-gradient topology)."""
    batch, (b, v, n, c, k, ny, nx) = module_fixture

    def loss_fn(mode, params, pts):
        mod = _build_scatter(mode, k, c, ny, nx)
        bd = dict(batch)
        bd['point_features'] = pts
        out = mod.apply({'params': params}, bd, train=True)
        return (out['spatial_features'].sum()
                + out['spatial_features_point'].sum()
                + out['point_positive_features'].sum()
                + out['memory_positive_features'].sum())

    grads = {}
    for mode in ('gather', 'fused'):
        mod = _build_scatter(mode, k, c, ny, nx)
        vars_ = mod.init(jax.random.PRNGKey(0), dict(batch), train=True)
        g = jax.grad(lambda p, x: loss_fn(mode, p, x), argnums=(0, 1))(
            vars_['params'], batch['point_features'])
        grads[mode] = g
    gw_f = np.asarray(grads['fused'][0]['memory']['weight'])
    gw_g = np.asarray(grads['gather'][0]['memory']['weight'])
    np.testing.assert_allclose(gw_f, gw_g, rtol=3e-2, atol=3e-2)
    gp_f, gp_g = np.asarray(grads['fused'][1]), np.asarray(grads['gather'][1])
    np.testing.assert_allclose(gp_f, gp_g, rtol=3e-2, atol=3e-2)
