"""End-to-end model smoke tests: build HVPR from config, init, train+eval forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvpr_tpu.config import ConfigDict

# a scaled-down HVPR config (same structure as tools/cfgs/kitti_models/hvpr.yaml)
TINY_GRID = (32, 16, 1)   # nx, ny, nz
PCR = (0.0, -2.56, -2.5, 5.12, 2.56, 0.5)
VOXEL = (0.16, 0.16, 3.0)
N_POINTS = 256
N_VOXELS = 128
N_PVOXEL = 8


def tiny_model_cfg():
    return ConfigDict({
        'NAME': 'MixAnchor_Memory',
        'BACKBONE_3D': {
            'NAME': 'PointNet2MSG',
            'SA_CONFIG': {
                'NPOINTS': [64, 16],
                'RADIUS': [[0.4, 0.8], [0.8, 1.2]],
                'NSAMPLE': [[8, 8], [8, 8]],
                'MLPS': [[[8, 8, 16], [8, 8, 16]],
                         [[16, 16, 32], [16, 16, 32]]],
            },
            'FP_MLPS': [[32, 32], [32, 32]],
        },
        'VFE': {
            'NAME': 'PillarVFE_Scale',
            'WITH_DISTANCE': False,
            'USE_ABSLOTE_XYZ': True,
            'USE_NORM': True,
            'NUM_FILTERS': [16, 32],
            'NUM_SCALE_FEATURES': [8, 16],
        },
        'MAP_TO_BEV': {
            'NAME': 'PointPillarScatter_Agg_Memory_1_scale',
            'NUM_BEV_FEATURES': 64,
            'NUM_PT_FEATURES': 32,
            'NUM_SCALE_FEATURES': 16,
            'NUM_COORD_POINTS': 3,
            'NUM_K': 4,
            'NUM_M': 50,
            'SHRINK_TH': 0.0025,
        },
        'BACKBONE_2D': {
            # LAYER_STRIDES start at 2 so the head map matches the stride-2
            # anchors (the reference yaml's [1, 2, 2] is internally
            # inconsistent with feature_map_stride 2 — see SURVEY.md §0)
            'NAME': 'BaseBEVBackbone_Scale',
            'LAYER_NUMS': [1, 1],
            'SFM_LAYER_NUMS': [1, 1],
            'LAYER_STRIDES': [2, 2],
            'NUM_FILTERS': [32, 64],
            'NUM_SCALE_FILTERS': [16, 32],
            'UPSAMPLE_STRIDES': [1, 2],
            'NUM_UPSAMPLE_FILTERS': [32, 32],
        },
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadSingle',
            'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True,
            'DIR_OFFSET': 0.78539,
            'DIR_LIMIT_OFFSET': 0.0,
            'NUM_DIR_BINS': 2,
            'ANCHOR_GENERATOR_CONFIG': [{
                'class_name': 'Car',
                'anchor_sizes': [[3.9, 1.6, 1.56]],
                'anchor_rotations': [0, 1.57],
                'anchor_bottom_heights': [-1.78],
                'align_center': False,
                'feature_map_stride': 2,
                'matched_threshold': 0.6,
                'unmatched_threshold': 0.45,
            }],
            'TARGET_ASSIGNER_CONFIG': {
                'NAME': 'AxisAlignedTargetAssigner',
                'POS_FRACTION': -1.0,
                'SAMPLE_SIZE': 512,
                'NORM_BY_NUM_EXAMPLES': False,
                'MATCH_HEIGHT': False,
                'BOX_CODER': 'ResidualCoder',
            },
            'LOSS_CONFIG': {
                'LOSS_WEIGHTS': {
                    'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
                    'mem_weight': 1.0,
                    'code_weights': [1.0] * 7,
                },
            },
        },
        'POST_PROCESSING': {
            'RECALL_THRESH_LIST': [0.3, 0.5, 0.7],
            'SCORE_THRESH': 0.1,
            'OUTPUT_RAW_SCORE': False,
            'EVAL_METRIC': 'kitti',
            'NMS_CONFIG': {
                'MULTI_CLASSES_NMS': False,
                'NMS_TYPE': 'nms_gpu',
                'NMS_THRESH': 0.1,
                'NMS_PRE_MAXSIZE': 256,
                'NMS_POST_MAXSIZE': 32,
            },
        },
    })


class _FakeDataset:
    class_names = ['Car']
    grid_size = TINY_GRID
    point_cloud_range = PCR
    voxel_size = VOXEL


def make_batch(rng, batch_size=2, with_gt=True):
    from hvpr_tpu.ops.voxelizer import VoxelGeneratorNumpy
    gen = VoxelGeneratorNumpy(VOXEL, PCR, N_PVOXEL, N_VOXELS)

    batch = {
        'points': np.zeros((batch_size, N_POINTS, 4), np.float32),
        'point_valid_mask': np.ones((batch_size, N_POINTS), bool),
        'voxels': np.zeros((batch_size, N_VOXELS, N_PVOXEL, 4), np.float32),
        'voxel_num_points': np.zeros((batch_size, N_VOXELS), np.int32),
        'voxel_coords': np.zeros((batch_size, N_VOXELS, 3), np.int32),
        'voxel_mask': np.zeros((batch_size, N_VOXELS), bool),
    }
    for b in range(batch_size):
        pts = np.zeros((N_POINTS, 4), np.float32)
        pts[:, 0] = rng.uniform(0.1, 5.0, N_POINTS)
        pts[:, 1] = rng.uniform(-2.5, 2.5, N_POINTS)
        pts[:, 2] = rng.uniform(-2.4, 0.4, N_POINTS)
        pts[:, 3] = rng.uniform(0, 1, N_POINTS)
        batch['points'][b] = pts
        v, c, n = gen.generate(pts)
        nv = len(c)
        batch['voxels'][b, :nv] = v
        batch['voxel_coords'][b, :nv] = c
        batch['voxel_num_points'][b, :nv] = n
        batch['voxel_mask'][b, :nv] = n > 0
    if with_gt:
        # two NON-overlapping cars (post-NMS recall tests need both to survive)
        gt = np.zeros((batch_size, 3, 8), np.float32)
        gt[:, 0] = [2.0, -1.3, -1.0, 3.9, 1.6, 1.56, 0.1, 1]
        gt[:, 1] = [3.2, 1.3, -1.0, 3.9, 1.6, 1.56, -0.1, 1]
        batch['gt_boxes'] = gt
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope='module')
def built():
    from hvpr_tpu.models import build_network
    cfg = tiny_model_cfg()
    net = build_network(cfg, num_class=1, dataset=_FakeDataset())
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    net.init(jax.random.PRNGKey(0), batch)
    return net, batch


def test_train_forward(built):
    net, batch = built
    loss, (tb, new_stats) = net.train_forward(net.variables, batch)
    assert np.isfinite(float(loss)), tb
    for k in ('rpn_loss', 'rpn_loss_point', 'mem_loss', 'rpn_loss_cls', 'rpn_loss_loc'):
        assert k in tb
        assert np.isfinite(float(tb[k])), (k, tb[k])
    assert new_stats  # batch stats were updated


@pytest.mark.slow
def test_train_grads_finite(built):
    net, batch = built

    def loss_fn(params):
        variables = {'params': params, 'batch_stats': net.variables['batch_stats']}
        loss, _ = net.train_forward(variables, batch)
        return loss

    grads = jax.grad(loss_fn)(net.variables['params'])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # memory weight must receive gradient (trained via detection + mem loss)
    mem_grad = grads['map_to_bev']['memory']['weight']
    assert float(jnp.abs(mem_grad).sum()) > 0


def test_eval_forward(built):
    net, batch = built
    out = net.eval_forward(batch)
    assert out['pred_boxes'].shape == (2, 32, 7)
    assert out['pred_scores'].shape == (2, 32)
    assert out['pred_mask'].dtype == jnp.bool_
    assert 'recall' in out
    assert int(out['recall']['gt']) == 4


def test_pointpillar_detector():
    from hvpr_tpu.models import build_network
    cfg = tiny_model_cfg()
    del cfg['BACKBONE_3D']
    cfg['NAME'] = 'PointPillar'
    cfg['VFE']['NAME'] = 'PillarVFE'
    cfg['MAP_TO_BEV'] = ConfigDict({'NAME': 'PointPillarScatter', 'NUM_BEV_FEATURES': 32})
    cfg['BACKBONE_2D']['NAME'] = 'BaseBEVBackbone'
    net = build_network(cfg, num_class=1, dataset=_FakeDataset())
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    net.init(jax.random.PRNGKey(1), batch)
    out = net.eval_forward(batch)
    assert out['pred_boxes'].shape == (2, 32, 7)
