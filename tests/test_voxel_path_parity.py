"""Full-model eval parity: device flat voxelization vs padded voxelization.

bench.py / __graft_entry__ drive the model through voxelize_batch_flat (the
channel-major flat VFE + sorted-cell canvas); tools/test.py drives it through
host-voxelized padded batches. Both must produce the same detections from the
same parameters — this guards the whole inference-path rewrite at the model
level (the VFE-level parity lives in test_flat_vfe.py).
"""

import jax
import numpy as np
import pytest

from hvpr_tpu.models import build_network
from hvpr_tpu.models.detectors.detector3d_template import post_processing
from hvpr_tpu.ops.voxelizer import voxelize_batch_flat, voxelize_batch_jax

from tests.test_model import (N_POINTS, N_PVOXEL, N_VOXELS, PCR, TINY_GRID,
                              VOXEL, _FakeDataset, make_batch, tiny_model_cfg)


def test_flat_and_padded_paths_agree_end_to_end():
    import jax.numpy as jnp
    cfg = tiny_model_cfg()
    net = build_network(cfg, num_class=1, dataset=_FakeDataset())

    batch = make_batch(np.random.default_rng(5), with_gt=False)
    points, pmask = batch['points'], batch['point_valid_mask']

    padded = voxelize_batch_jax(points, pmask, PCR, VOXEL,
                                max_voxels=N_VOXELS,
                                max_points_per_voxel=N_PVOXEL,
                                grid_size_static=TINY_GRID)
    flat = voxelize_batch_flat(points, pmask, PCR, VOXEL,
                               max_voxels=N_VOXELS,
                               max_points_per_voxel=N_PVOXEL,
                               grid_size_static=TINY_GRID)

    common = {'points': points, 'point_valid_mask': pmask}
    variables = net.init(jax.random.PRNGKey(2), {**common, **padded},
                         train=False)

    def run(vox):
        out = net.module.apply(variables, {**common, **vox}, train=False)
        return {k: np.asarray(v) for k, v in post_processing(
            out, cfg['POST_PROCESSING'], 1).items()}

    a, b = run(dict(padded)), run(dict(flat))
    assert a['pred_mask'].sum() == b['pred_mask'].sum()
    m = a['pred_mask'] & b['pred_mask']
    np.testing.assert_allclose(a['pred_scores'][m], b['pred_scores'][m],
                               atol=2e-4)
    np.testing.assert_allclose(a['pred_boxes'][m], b['pred_boxes'][m],
                               atol=2e-3)
