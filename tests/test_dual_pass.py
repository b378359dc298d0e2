"""Stacked vs sequential dual-pass BEV backbone parity (round 5).

BACKBONE_2D.DUAL_PASS='stacked' runs the HVPR train-time shared-weight dual
pass as ONE batched conv pass with per-split BatchNorm statistics
(model_utils.layers.SplitBatchNorm). It must be numerically the reference's
two sequential passes (base_bev_backbone.py:228-279): same outputs for both
maps AND the same updated running statistics (sequential order, memory map
first).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hvpr_tpu.models.backbones_2d.base_bev_backbone import BaseBEVBackboneScale
from hvpr_tpu.models.model_utils.layers import SplitBatchNorm


def _cfg(mode):
    return {
        'DUAL_PASS': mode,
        'LAYER_NUMS': [2, 2], 'SFM_LAYER_NUMS': [1, 2],
        'LAYER_STRIDES': [2, 2], 'NUM_FILTERS': [16, 32],
        'NUM_SCALE_FILTERS': [8, 16], 'UPSAMPLE_STRIDES': [1, 2],
        'NUM_UPSAMPLE_FILTERS': [16, 16],
    }


def _batch(rng):
    return {
        'spatial_features': jnp.asarray(
            rng.normal(size=(4, 24, 32, 12)).astype(np.float32)),
        'spatial_features_point': jnp.asarray(
            rng.normal(size=(4, 24, 32, 12)).astype(np.float32)),
        'spatial_scale_features': jnp.asarray(
            rng.normal(size=(4, 24, 32, 6)).astype(np.float32)),
    }


def test_stacked_matches_sequential():
    rng = np.random.default_rng(0)
    batch = _batch(rng)

    net_seq = BaseBEVBackboneScale(model_cfg=_cfg('sequential'),
                                   input_channels=12)
    variables = net_seq.init(jax.random.PRNGKey(0), dict(batch), train=True)

    out_seq, mut_seq = net_seq.apply(variables, dict(batch), train=True,
                                     mutable=['batch_stats'])
    net_st = BaseBEVBackboneScale(model_cfg=_cfg('stacked'),
                                  input_channels=12)
    out_st, mut_st = net_st.apply(variables, dict(batch), train=True,
                                  mutable=['batch_stats'])

    for key in ('spatial_features_2d', 'spatial_features_point_2d'):
        np.testing.assert_allclose(np.asarray(out_st[key]),
                                   np.asarray(out_seq[key]),
                                   rtol=2e-5, atol=2e-5)
    # running statistics: single-visit BNs update identically; BNs visited
    # multiple times per step (repeated SFM convs, attention) interleave
    # their EMA updates in stacked mode — bounded-by-construction at ~1e-3
    # relative (documented in base_bev_backbone.py)
    flat_seq = jax.tree_util.tree_leaves_with_path(mut_seq['batch_stats'])
    flat_st = {jax.tree_util.keystr(p): v
               for p, v in jax.tree_util.tree_leaves_with_path(
                   mut_st['batch_stats'])}
    for p, v in flat_seq:
        k = jax.tree_util.keystr(p)
        multi_visit = 'sfm_blocks' in k or 'attention' in k
        rtol = 5e-3 if multi_visit else 2e-5
        np.testing.assert_allclose(np.asarray(flat_st[k]), np.asarray(v),
                                   rtol=rtol, atol=rtol, err_msg=k)

    # eval path unaffected by the mode flag
    ev_seq = net_seq.apply(variables, dict(batch), train=False)
    ev_st = net_st.apply(variables, dict(batch), train=False)
    np.testing.assert_allclose(np.asarray(ev_st['spatial_features_2d']),
                               np.asarray(ev_seq['spatial_features_2d']))


def test_split_batchnorm_matches_two_sequential_calls():
    """SplitBatchNorm(splits=2) == two sequential splits=1 calls on halves."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 5, 6, 7)).astype(np.float32))

    bn = SplitBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), x, True)

    y2, mut2 = bn.apply(variables, x, True, splits=2,
                        mutable=['batch_stats'])
    ya, muta = bn.apply(variables, x[:4], True, mutable=['batch_stats'])
    yb, mutb = bn.apply({**variables, **muta}, x[4:], True,
                        mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(y2[:4]), np.asarray(ya),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y2[4:]), np.asarray(yb),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mut2['batch_stats']['mean']),
        np.asarray(mutb['batch_stats']['mean']), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mut2['batch_stats']['var']),
        np.asarray(mutb['batch_stats']['var']), rtol=1e-6, atol=1e-6)


def test_split_batchnorm_matches_flax_at_splits1():
    import flax.linen as nn
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(6, 4, 3, 5)).astype(np.float32))

    ref = nn.BatchNorm(use_running_average=False, momentum=0.99,
                       epsilon=1e-3)
    vref = ref.init(jax.random.PRNGKey(0), x)
    yref, mref = ref.apply(vref, x, mutable=['batch_stats'])

    bn = SplitBatchNorm()
    vbn = bn.init(jax.random.PRNGKey(0), x, True)
    ybn, mbn = bn.apply(vbn, x, True, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(ybn), np.asarray(yref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mbn['batch_stats']['mean']),
        np.asarray(mref['batch_stats']['mean']), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mbn['batch_stats']['var']),
        np.asarray(mref['batch_stats']['var']), rtol=1e-6, atol=1e-6)
