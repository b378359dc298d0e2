"""SECOND-style pipeline: MeanVFE + sparse VoxelBackBone8x + HeightCompression."""

import jax
import numpy as np

from hvpr_tpu.config import ConfigDict
from tests.test_model import TINY_GRID, make_batch, tiny_model_cfg


class _FakeDataset3D:
    class_names = ['Car']
    # nz=24 so the z axis survives to the upstream conv_out ((3,1,1)/(2,1,1)
    # /p0): 24 -> 12 -> 6 -> 3 -> 1 (upstream KITTI z-grid is 41 -> ... -> 2)
    grid_size = (64, 32, 24)           # nx, ny, nz — dense-3D-tractable
    point_cloud_range = (0.0, -2.56, -2.5, 10.24, 2.56, 0.5)
    voxel_size = (0.16, 0.16, 0.125)


def test_second_pipeline_forward():
    from hvpr_tpu.models import build_network
    from hvpr_tpu.ops.voxelizer import VoxelGeneratorNumpy
    import jax.numpy as jnp

    cfg = tiny_model_cfg()
    del cfg['BACKBONE_3D']
    cfg['NAME'] = 'PointPillar'
    cfg['VFE'] = ConfigDict({'NAME': 'MeanVFE'})
    cfg['BACKBONE_3D'] = ConfigDict({'NAME': 'VoxelBackBone8x',
                                 'OUT_CHANNELS': 64})
    cfg['MAP_TO_BEV'] = ConfigDict({'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 64})
    cfg['BACKBONE_2D']['NAME'] = 'BaseBEVBackbone'
    # height-compressed map is at stride 8; backbone adds another 2x
    cfg['DENSE_HEAD']['ANCHOR_GENERATOR_CONFIG'][0]['feature_map_stride'] = 16

    ds = _FakeDataset3D()
    from hvpr_tpu.models.detectors.pointpillar import PointPillar

    class SecondNet(PointPillar):
        def __call__(self, batch_dict, train: bool = False):
            batch_dict = dict(batch_dict)
            batch_dict = self.vfe(batch_dict, train)
            batch_dict = self.backbone_3d(batch_dict, train)
            batch_dict = self.map_to_bev(batch_dict, train)
            batch_dict = self.backbone_2d(batch_dict, train)
            batch_dict = self.dense_head(batch_dict, train)
            return batch_dict

    net_module = SecondNet(
        model_cfg=cfg, num_class=1, class_names=['Car'],
        grid_size=ds.grid_size, point_cloud_range=ds.point_cloud_range,
        voxel_size=ds.voxel_size, num_point_features=4)

    # build a small voxelized batch on the 3D grid
    rng = np.random.default_rng(0)
    gen = VoxelGeneratorNumpy(ds.voxel_size, ds.point_cloud_range, 8, 256)
    batch = {
        'voxels': np.zeros((1, 256, 8, 4), np.float32),
        'voxel_coords': np.zeros((1, 256, 3), np.int32),
        'voxel_num_points': np.zeros((1, 256), np.int32),
        'voxel_mask': np.zeros((1, 256), bool),
    }
    pts = np.zeros((400, 4), np.float32)
    pts[:, 0] = rng.uniform(0.1, 10.0, 400)
    pts[:, 1] = rng.uniform(-2.5, 2.5, 400)
    pts[:, 2] = rng.uniform(-2.4, 0.4, 400)
    v, c, n = gen.generate(pts)
    nv = len(c)
    batch['voxels'][0, :nv] = v
    batch['voxel_coords'][0, :nv] = c
    batch['voxel_num_points'][0, :nv] = n
    batch['voxel_mask'][0, :nv] = n > 0
    batch = {k: jnp.asarray(v_) for k, v_ in batch.items()}

    variables = net_module.init(jax.random.PRNGKey(0), batch, train=False)
    out = net_module.apply(variables, batch, train=False)
    # grid 64x32x8 -> 8x downsample -> height-compressed BEV (4, 8)
    assert out['batch_box_preds'].shape[-1] == 7
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()
