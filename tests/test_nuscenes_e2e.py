"""End-to-end NuScenes CLI test: train 1 epoch, then evaluate.

The KITTI analogue lives in test_tools_e2e.py; this drives the same
tools/train.py -> post-train eval -> tools/test.py chain over the NuScenes
dataset (multi-sweep 5-channel points, balanced resampling, center-distance
AP fallback) on the 8-device CPU mesh — proving the dataset is wired through
the full user-facing workflow, not just the dataloader registry.
"""

import os
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent


def _build_nusc_root(base, n_samples=8):
    """Synthetic v1.0-mini split: n_samples refs, one translated sweep each."""
    root = base / 'nuscenes' / 'v1.0-mini'
    (root / 'samples').mkdir(parents=True)
    (root / 'sweeps').mkdir()
    rng = np.random.default_rng(11)

    infos = []
    for s in range(n_samples):
        ref = np.zeros((256, 5), np.float32)
        ref[:, :3] = rng.uniform(-6, 6, (256, 3))
        ref[:, 3] = rng.uniform(0, 1, 256)
        ref.tofile(root / 'samples' / f'ref_{s}.bin')

        sweep = np.zeros((128, 5), np.float32)
        sweep[:, :3] = rng.uniform(-6, 6, (128, 3))
        sweep.tofile(root / 'sweeps' / f'sw_{s}.bin')
        tm = np.eye(4, dtype=np.float32)
        tm[:3, 3] = [1.0, -2.0, 0.1]

        ref_to_global = np.eye(4, dtype=np.float32)
        ref_to_global[:3, 3] = [100.0 + s, 50.0, 0.0]

        infos.append({
            'lidar_path': f'samples/ref_{s}.bin',
            'token': f'tok{s}',
            'timestamp': 1e5 + s,
            'ref_to_global': ref_to_global,
            'sweeps': [{'lidar_path': f'sweeps/sw_{s}.bin',
                        'transform_matrix': tm, 'time_lag': 0.05}],
            'gt_boxes': np.array([[2.0, 1.0, 0.0, 4.0, 2.0, 1.5, 0.3],
                                  [-3.0, -2.0, 0.0, 4.0, 2.0, 1.5, -0.4]],
                                 np.float32),
            'gt_names': np.array(['car', 'truck']),
            'num_lidar_pts': np.array([10, 10]),
        })
    for name in ('infos_train.pkl', 'infos_val.pkl'):
        with open(root / name, 'wb') as f:
            pickle.dump(infos, f)
    return root.parent


MINI_NUSC = {
    'CLASS_NAMES': ['car', 'truck'],
    'DATA_CONFIG': {
        'DATASET': 'NuScenesDataset',
        'DATA_PATH': None,  # filled per-test
        'VERSION': 'v1.0-mini',
        'POINT_CLOUD_RANGE': [-6.4, -6.4, -5.0, 6.4, 6.4, 3.0],
        'MAX_SWEEPS': 2,
        'FILTER_MIN_POINTS_IN_GT': 1,
        'BALANCED_RESAMPLING': True,
        'MAX_GT_BOXES': 16,
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'INFO_PATH': {'train': ['infos_train.pkl'],
                      'test': ['infos_val.pkl']},
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp'],
            'src_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp'],
        },
        'DATA_AUGMENTOR': {
            'DISABLE_AUG_LIST': ['placeholder'],
            'AUG_CONFIG_LIST': [
                {'NAME': 'random_world_flip', 'ALONG_AXIS_LIST': ['x', 'y']},
                {'NAME': 'random_world_rotation',
                 'WORLD_ROT_ANGLE': [-0.3925, 0.3925]},
                {'NAME': 'random_world_scaling',
                 'WORLD_SCALE_RANGE': [0.95, 1.05]},
            ],
        },
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'sample_points', 'NUM_POINTS': {'train': 512, 'test': 512}},
            {'NAME': 'shuffle_points', 'SHUFFLE_ENABLED': {'train': True, 'test': False}},
            {'NAME': 'transform_points_to_voxels', 'VOXEL_SIZE': [0.4, 0.4, 8.0],
             'MAX_POINTS_PER_VOXEL': 8,
             'MAX_NUMBER_OF_VOXELS': {'train': 512, 'test': 512}},
        ],
    },
    'MODEL': {
        'NAME': 'PointPillar',
        'VFE': {'NAME': 'PillarVFE', 'WITH_DISTANCE': False,
                'USE_ABSLOTE_XYZ': True, 'USE_NORM': True, 'NUM_FILTERS': [16]},
        'MAP_TO_BEV': {'NAME': 'PointPillarScatter', 'NUM_BEV_FEATURES': 16},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1, 1],
                        'LAYER_STRIDES': [2, 2], 'NUM_FILTERS': [16, 32],
                        'UPSAMPLE_STRIDES': [1, 2],
                        'NUM_UPSAMPLE_FILTERS': [16, 16]},
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True, 'DIR_OFFSET': 0.78539,
            'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
            'ANCHOR_GENERATOR_CONFIG': [
                {'class_name': 'car', 'anchor_sizes': [[4.0, 2.0, 1.5]],
                 'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.0],
                 'align_center': False, 'feature_map_stride': 2,
                 'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
                {'class_name': 'truck', 'anchor_sizes': [[4.0, 2.0, 1.5]],
                 'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.0],
                 'align_center': False, 'feature_map_stride': 2,
                 'matched_threshold': 0.55, 'unmatched_threshold': 0.4}],
            'TARGET_ASSIGNER_CONFIG': {
                'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
                'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
                'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder'},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
                'code_weights': [1.0] * 7}},
        },
        'POST_PROCESSING': {
            'RECALL_THRESH_LIST': [0.3, 0.5, 0.7], 'SCORE_THRESH': 0.1,
            'OUTPUT_RAW_SCORE': False, 'EVAL_METRIC': 'nuscenes',
            'NMS_CONFIG': {'MULTI_CLASSES_NMS': True, 'NMS_TYPE': 'nms_gpu',
                           'NMS_THRESH': 0.2, 'NMS_PRE_MAXSIZE': 128,
                           'NMS_POST_MAXSIZE': 32}},
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
def test_nuscenes_train_then_eval_cli(tmp_path):
    import copy
    data_root = _build_nusc_root(tmp_path)
    cfg = copy.deepcopy(MINI_NUSC)
    cfg['DATA_CONFIG']['DATA_PATH'] = str(data_root)

    cfg_dir = tmp_path / 'cfgs' / 'nuscenes_models'
    cfg_dir.mkdir(parents=True)
    cfg_file = cfg_dir / 'mini_nusc.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = env.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
    env['PYTHONPATH'] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env['HVPR_ROOT_DIR'] = str(tmp_path)
    env['JAX_COMPILATION_CACHE_DIR'] = str(REPO / 'tests' / '.jax_cache')
    env['JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS'] = '1'

    out = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'train.py'),
         '--cfg_file', 'cfgs/nuscenes_models/mini_nusc.yaml', '--batch_size', '8',
         '--epochs', '1', '--workers', '0', '--extra_tag', 'e2e'],
        capture_output=True, text=True, timeout=2400, env=env, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-4000:]

    ckpt_dir = tmp_path / 'output' / 'nuscenes_models' / 'mini_nusc' / 'e2e' / 'ckpt'
    ckpts = list(ckpt_dir.glob('checkpoint_epoch_*.msgpack'))
    assert ckpts, f'no checkpoints in {ckpt_dir}: {out.stdout[-2000:]}'

    out = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'test.py'),
         '--cfg_file', 'cfgs/nuscenes_models/mini_nusc.yaml', '--batch_size', '2',
         '--workers', '0', '--extra_tag', 'e2e', '--ckpt', str(ckpts[-1]),
         '--save_to_file'],
        capture_output=True, text=True, timeout=2400, env=env, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-4000:]
    combined = out.stdout + out.stderr
    assert 'Evaluation done' in combined
    # the devkit-free fallback reports center-distance AP per class
    assert 'center-distance AP' in combined
    # --save_to_file wrote per-frame global-frame submission rows
    eval_dir = tmp_path / 'output' / 'nuscenes_models' / 'mini_nusc' / 'e2e' / 'eval'
    saved = list(eval_dir.rglob('tok*.json'))
    assert saved, f'no submission rows under {eval_dir}: {combined[-2000:]}'
