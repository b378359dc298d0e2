"""Flat-point VFE path must match the padded path exactly (shared params)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_model import PCR, VOXEL, tiny_model_cfg, _FakeDataset


def test_flat_vfe_matches_padded():
    from hvpr_tpu.models.backbones_3d.vfe.pillar_vfe import PillarVFE_Scale
    from hvpr_tpu.ops.voxelizer import voxelize_batch_flat, voxelize_batch_jax

    cfg = tiny_model_cfg()['VFE']
    vfe = PillarVFE_Scale(model_cfg=cfg, num_point_features=4,
                          voxel_size=VOXEL, point_cloud_range=PCR)

    rng = np.random.default_rng(0)
    b, n = 2, 300
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.1, 5.0, (b, n))
    pts[..., 1] = rng.uniform(-2.5, 2.5, (b, n))
    pts[..., 2] = rng.uniform(-2.4, 0.4, (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    mask = rng.uniform(size=(b, n)) > 0.1
    grid = (32, 16, 1)

    padded = voxelize_batch_jax(jnp.asarray(pts), jnp.asarray(mask), PCR, VOXEL,
                                max_voxels=128, max_points_per_voxel=8,
                                grid_size_static=grid)
    flat = voxelize_batch_flat(jnp.asarray(pts), jnp.asarray(mask), PCR, VOXEL,
                               max_voxels=128, max_points_per_voxel=8,
                               grid_size_static=grid)

    variables = vfe.init(jax.random.PRNGKey(0), dict(padded), train=False)

    out_pad = vfe.apply(variables, dict(padded), train=False)
    out_flat = vfe.apply(variables, dict(flat), train=False)

    np.testing.assert_allclose(np.asarray(out_pad['pillar_features']),
                               np.asarray(out_flat['pillar_features']),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_pad['pillar_scale_features']),
                               np.asarray(out_flat['pillar_scale_features']),
                               atol=2e-5)

    # training path: masked-BN stats must also agree
    out_pad, var_pad = vfe.apply(variables, dict(padded), train=True,
                                 mutable=['batch_stats'])
    out_flat, var_flat = vfe.apply(variables, dict(flat), train=True,
                                   mutable=['batch_stats'])
    import flax
    fp = flax.traverse_util.flatten_dict(var_pad['batch_stats'])
    ff = flax.traverse_util.flatten_dict(var_flat['batch_stats'])
    assert set(fp) == set(ff)
    for k in fp:
        np.testing.assert_allclose(np.asarray(fp[k]), np.asarray(ff[k]),
                                    atol=2e-5, err_msg=str(k))
