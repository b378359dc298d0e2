"""End-to-end CLI test: train 1 epoch on synthetic KITTI, then evaluate.

Drives tools/train.py and tools/test.py as subprocesses with a scaled-down
HVPR config — the full user-facing workflow (config loading, dataloader,
training loop, checkpointing, eval with AP) on the 8-device CPU mesh.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent

MINI_MODEL = {
    'CLASS_NAMES': ['Car'],
    'DATA_CONFIG': {
        'DATASET': 'KittiDataset',
        'DATA_PATH': None,  # filled per-test
        'POINT_CLOUD_RANGE': [0, -20.48, -2.5, 47.36, 20.48, 0.5],
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'INFO_PATH': {'train': ['kitti_infos_train.pkl'],
                      'test': ['kitti_infos_val.pkl']},
        'FOV_POINTS_ONLY': True,
        'MAX_GT_BOXES': 64,
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity'],
            'src_feature_list': ['x', 'y', 'z', 'intensity'],
        },
        'DATA_AUGMENTOR': {
            'DISABLE_AUG_LIST': ['placeholder'],
            'AUG_CONFIG_LIST': [
                {'NAME': 'gt_sampling', 'USE_ROAD_PLANE': True,
                 'DB_INFO_PATH': ['kitti_dbinfos_train.pkl'],
                 'PREPARE': {'filter_by_min_points': ['Car:5'],
                             'filter_by_difficulty': [-1]},
                 'SAMPLE_GROUPS': ['Car:3'], 'NUM_POINT_FEATURES': 4,
                 'DATABASE_WITH_FAKELIDAR': False,
                 'REMOVE_EXTRA_WIDTH': [0.0, 0.0, 0.0],
                 'LIMIT_WHOLE_SCENE': False},
                {'NAME': 'random_world_flip', 'ALONG_AXIS_LIST': ['x']},
                {'NAME': 'random_world_rotation',
                 'WORLD_ROT_ANGLE': [-0.78539816, 0.78539816]},
                {'NAME': 'random_world_scaling',
                 'WORLD_SCALE_RANGE': [0.95, 1.05]},
            ],
        },
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'sample_points', 'NUM_POINTS': {'train': 1024, 'test': 1024}},
            {'NAME': 'shuffle_points', 'SHUFFLE_ENABLED': {'train': True, 'test': False}},
            {'NAME': 'transform_points_to_voxels', 'VOXEL_SIZE': [0.74, 0.64, 3],
             'MAX_POINTS_PER_VOXEL': 16,
             'MAX_NUMBER_OF_VOXELS': {'train': 1024, 'test': 1024}},
        ],
    },
    'MODEL': {
        'NAME': 'MixAnchor_Memory',
        'BACKBONE_3D': {
            'NAME': 'PointNet2MSG',
            'SA_CONFIG': {
                'NPOINTS': [128, 32],
                'RADIUS': [[0.4, 0.8], [0.8, 1.2]],
                'NSAMPLE': [[8, 8], [8, 8]],
                'MLPS': [[[8, 8, 16], [8, 8, 16]], [[16, 16, 32], [16, 16, 32]]],
            },
            'FP_MLPS': [[32, 32], [32, 32]],
        },
        'VFE': {'NAME': 'PillarVFE_Scale', 'WITH_DISTANCE': False,
                'USE_ABSLOTE_XYZ': True, 'USE_NORM': True,
                'NUM_FILTERS': [16, 32], 'NUM_SCALE_FEATURES': [8, 16]},
        'MAP_TO_BEV': {'NAME': 'PointPillarScatter_Agg_Memory_1_scale',
                       'NUM_BEV_FEATURES': 64, 'NUM_PT_FEATURES': 32,
                       'NUM_SCALE_FEATURES': 16, 'NUM_COORD_POINTS': 3,
                       'NUM_K': 4, 'NUM_M': 64, 'SHRINK_TH': 0.0025},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone_Scale',
                        'LAYER_NUMS': [1, 1], 'SFM_LAYER_NUMS': [1, 1],
                        'LAYER_STRIDES': [2, 2], 'NUM_FILTERS': [32, 64],
                        'NUM_SCALE_FILTERS': [16, 32],
                        'UPSAMPLE_STRIDES': [1, 2],
                        'NUM_UPSAMPLE_FILTERS': [32, 32]},
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True, 'DIR_OFFSET': 0.78539,
            'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
            'ANCHOR_GENERATOR_CONFIG': [
                {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
                 'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
                 'align_center': False, 'feature_map_stride': 2,
                 'matched_threshold': 0.6, 'unmatched_threshold': 0.45}],
            'TARGET_ASSIGNER_CONFIG': {
                'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
                'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
                'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder'},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
                'mem_weight': 1.0, 'code_weights': [1.0] * 7}},
        },
        'POST_PROCESSING': {
            'RECALL_THRESH_LIST': [0.3, 0.5, 0.7], 'SCORE_THRESH': 0.1,
            'OUTPUT_RAW_SCORE': False, 'EVAL_METRIC': 'kitti',
            'NMS_CONFIG': {'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                           'NMS_THRESH': 0.1, 'NMS_PRE_MAXSIZE': 256,
                           'NMS_POST_MAXSIZE': 64}},
    },
    'OPTIMIZATION': {
        'BATCH_SIZE_PER_GPU': 1, 'NUM_EPOCHS': 1,
        'OPTIMIZER': 'adam_onecycle', 'LR': 0.003, 'WEIGHT_DECAY': 0.01,
        'MOMENTUM': 0.9, 'MOMS': [0.95, 0.85], 'PCT_START': 0.4,
        'DIV_FACTOR': 10, 'DECAY_STEP_LIST': [35, 45], 'LR_DECAY': 0.1,
        'LR_CLIP': 1e-7, 'LR_WARMUP': False, 'WARMUP_EPOCH': 1,
        'GRAD_NORM_CLIP': 10,
    },
}


@pytest.mark.slow
def test_train_then_eval_cli(tmp_path):
    from tests.kitti_fixture import build_kitti_root
    root, _ = build_kitti_root(tmp_path / 'kitti', n_scenes=16)

    from hvpr_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    from hvpr_tpu.config import ConfigDict
    import copy
    cfg = copy.deepcopy(MINI_MODEL)
    cfg['DATA_CONFIG']['DATA_PATH'] = str(root)
    create_kitti_infos(ConfigDict(cfg['DATA_CONFIG']), ['Car'], root, root, workers=2)

    cfg_dir = tmp_path / 'cfgs' / 'kitti_models'
    cfg_dir.mkdir(parents=True)
    cfg_file = cfg_dir / 'mini_hvpr.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = env.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
    env['PYTHONPATH'] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env['HVPR_ROOT_DIR'] = str(tmp_path)
    # share the persistent compile cache with the test process
    env['JAX_COMPILATION_CACHE_DIR'] = str(REPO / 'tests' / '.jax_cache')
    env['JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS'] = '1'

    out = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'train.py'),
         '--cfg_file', 'cfgs/kitti_models/mini_hvpr.yaml', '--batch_size', '8',
         '--epochs', '1', '--workers', '0', '--extra_tag', 'e2e'],
        capture_output=True, text=True, timeout=1200, env=env, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-4000:]

    ckpt_dir = tmp_path / 'output' / 'kitti_models' / 'mini_hvpr' / 'e2e' / 'ckpt'
    ckpts = list(ckpt_dir.glob('checkpoint_epoch_*.msgpack'))
    assert ckpts, f'no checkpoints in {ckpt_dir}: {out.stdout[-2000:]}'

    # train.py chains the post-train eval watcher (reference train.py:180-196)
    eval_with_train = ckpt_dir.parent / 'eval' / 'eval_with_train'
    assert list(eval_with_train.glob('epoch_*/*/result.pkl')), \
        f'post-train eval produced no results: {out.stdout[-2000:]}'
    assert 'has been evaluated' in out.stdout + out.stderr

    out = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'test.py'),
         '--cfg_file', 'cfgs/kitti_models/mini_hvpr.yaml', '--batch_size', '2',
         '--workers', '0', '--extra_tag', 'e2e', '--ckpt', str(ckpts[-1])],
        capture_output=True, text=True, timeout=1200, env=env, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-4000:]
    assert 'Evaluation done' in out.stdout + out.stderr

    # demo CLI on the raw velodyne dir with the trained checkpoint
    out = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'demo.py'),
         '--cfg_file', 'cfgs/kitti_models/mini_hvpr.yaml',
         '--data_path', str(root / 'training' / 'velodyne'),
         '--ckpt', str(ckpts[-1]),
         '--save_bev', str(tmp_path / 'bev'),
         '--save_3d', str(tmp_path / 'scene3d')],
        capture_output=True, text=True, timeout=1200, env=env, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-4000:]
    assert 'Demo done' in out.stdout + out.stderr
    assert list((tmp_path / 'bev').glob('*.png'))
    assert list((tmp_path / 'scene3d').glob('*_3d.png'))
    assert list((tmp_path / 'scene3d').glob('*.ply'))
