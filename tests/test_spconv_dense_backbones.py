"""Dense-fallback SECOND-family 3D backbones (registry parity modules).

Regression: UNetV2's decoder crashed on any grid whose dims are not
divisible by 8 — the stride-2 ConvTranspose doubles a ceil-halved odd dim,
so the skip add got mismatched shapes (e.g. KITTI's nz=41).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvpr_tpu.models.backbones_3d.spconv_backbone import (
    UNetV2, VoxelBackBone8x, VoxelResBackBone8x,
)


def _voxel_batch(rng, grid_xyz, b=1, v=32, p=4, c=4):
    nx, ny, nz = grid_xyz
    coords = np.stack([rng.integers(0, nz, (b, v)),
                       rng.integers(0, ny, (b, v)),
                       rng.integers(0, nx, (b, v))], axis=-1)
    return {
        'voxels': jnp.asarray(rng.normal(size=(b, v, p, c)).astype(np.float32)),
        'voxel_num_points': jnp.asarray(
            rng.integers(1, p + 1, (b, v)).astype(np.int32)),
        'voxel_coords': jnp.asarray(coords.astype(np.int32)),
        'voxel_mask': jnp.ones((b, v), bool),
    }


@pytest.mark.parametrize('grid', [(8, 8, 8), (9, 11, 5)])  # odd dims too
@pytest.mark.parametrize('cls', [VoxelBackBone8x, VoxelResBackBone8x, UNetV2])
def test_dense_3d_backbones_run_on_any_grid(cls, grid):
    rng = np.random.default_rng(0)
    batch = _voxel_batch(rng, grid)
    net = cls(model_cfg={}, input_channels=4, grid_size=grid)
    variables = net.init(jax.random.PRNGKey(0), batch, train=False)
    out = net.apply(variables, batch, train=False)
    enc = out['encoded_spconv_tensor']
    assert out['encoded_spconv_tensor_stride'] == 8
    assert np.isfinite(np.asarray(enc)).all()
    if cls is UNetV2:
        nx, ny, nz = grid
        # full-resolution decoder output aligned to the input volume
        assert out['voxel_unet_features'].shape[1:4] == (nz, ny, nx)
