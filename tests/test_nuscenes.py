"""NuScenes dataset: sweeps, resampling, predictions, devkit-free eval.

The reference registers NuScenesDataset without shipping its source
(reference datasets/__init__.py:9,14; SURVEY.md §0); these tests pin the
in-tree implementation against synthetic fixtures: known ego-motion
transforms for sweep compensation, a long-tailed label distribution for
balanced resampling, and hand-built detections for the center-distance AP.
"""

import pickle

import numpy as np
import pytest

from hvpr_tpu.config import ConfigDict
from hvpr_tpu.datasets.nuscenes.nuscenes_dataset import (
    NuScenesDataset, boxes_lidar_to_global, transform_points)


def _write_bin(path, pts_xyzi):
    """nuScenes raw layout: (N, 5) float32 [x y z intensity ring]."""
    rows = np.concatenate(
        [pts_xyzi, np.zeros((len(pts_xyzi), 1), np.float32)], axis=1)
    rows.astype(np.float32).tofile(str(path))


def _dataset_cfg():
    return ConfigDict({
        'DATASET': 'NuScenesDataset',
        'DATA_PATH': 'unused',
        'VERSION': 'v1.0-mini',
        'MAX_SWEEPS': 3,
        'FILTER_MIN_POINTS_IN_GT': 1,
        'BALANCED_RESAMPLING': False,
        'POINT_CLOUD_RANGE': [-8.0, -8.0, -5.0, 8.0, 8.0, 3.0],
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'INFO_PATH': {'train': ['infos_train.pkl'], 'test': ['infos_val.pkl']},
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp'],
            'src_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp'],
        },
        'DATA_AUGMENTOR': {
            'DISABLE_AUG_LIST': ['placeholder'],
            'AUG_CONFIG_LIST': [
                {'NAME': 'random_world_flip', 'ALONG_AXIS_LIST': ['x']},
            ],
        },
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'shuffle_points',
             'SHUFFLE_ENABLED': {'train': False, 'test': False}},
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.5, 0.5, 8.0],
             'MAX_POINTS_PER_VOXEL': 8,
             'MAX_NUMBER_OF_VOXELS': {'train': 512, 'test': 512}},
        ],
    })


@pytest.fixture
def nusc_root(tmp_path):
    """Two-sample synthetic split with one ego-translated sweep each."""
    root = tmp_path / 'nuscenes' / 'v1.0-mini'
    (root / 'samples').mkdir(parents=True)
    (root / 'sweeps').mkdir()
    rng = np.random.default_rng(7)

    infos = []
    for s in range(2):
        ref = rng.uniform(-6, 6, (64, 4)).astype(np.float32)
        ref[:, 3] = rng.uniform(0, 1, 64)
        _write_bin(root / 'samples' / f'ref_{s}.bin', ref)

        sweep = rng.uniform(-6, 6, (32, 4)).astype(np.float32)
        _write_bin(root / 'sweeps' / f'sw_{s}.bin', sweep)
        tm = np.eye(4, dtype=np.float32)
        tm[:3, 3] = [1.0, -2.0, 0.1]  # known ego displacement

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


def test_sweep_aggregation_and_getitem(nusc_root):
    ds = NuScenesDataset(_dataset_cfg(), class_names=['car', 'truck'],
                         training=False, root_path=nusc_root)
    assert len(ds) == 2

    pts = ds.get_lidar_with_sweeps(0, max_sweeps=3)
    assert pts.shape[1] == 5
    # ref points carry time 0, sweep points the stored lag
    lags = np.unique(pts[:, 4])
    assert np.allclose(sorted(lags), [0.0, 0.05])

    # the sweep block must equal raw sweep points shifted by the transform
    raw = np.fromfile(
        str(nusc_root / 'v1.0-mini' / 'sweeps' / 'sw_0.bin'),
        np.float32).reshape(-1, 5)[:, :4]
    keep = ~((np.abs(raw[:, 0]) < 1.0) & (np.abs(raw[:, 1]) < 1.0))
    expected = raw[keep][:, :3] + np.array([1.0, -2.0, 0.1])
    got = pts[pts[:, 4] > 0][:, :3]
    assert got.shape == expected.shape
    assert np.allclose(got, expected, atol=1e-5)

    item = ds[0]
    assert item['voxels'].shape[1:] == (8, 5)
    assert item['voxel_coords'].shape[1] == 3
    assert item['gt_boxes'].shape[1] == 8  # 7 + class id column
    assert item['metadata']['token'] == 'tok0'


def test_training_path_and_collate(nusc_root):
    ds = NuScenesDataset(_dataset_cfg(), class_names=['car', 'truck'],
                         training=True, root_path=nusc_root)
    batch = ds.collate_batch([ds[0], ds[1]])
    assert batch['voxels'].shape[0] == 2
    assert batch['gt_boxes'].shape[0] == 2
    assert [m['token'] for m in batch['metadata']] == ['tok0', 'tok1']


def test_balanced_resampling(nusc_root):
    cfg = _dataset_cfg()
    cfg['BALANCED_RESAMPLING'] = True
    np.random.seed(0)
    ds = NuScenesDataset(cfg, class_names=['car', 'truck'],
                         training=True, root_path=nusc_root)
    # both samples contain both classes: resampling keeps total count stable
    assert len(ds.infos) == 4  # 2 buckets x 2 infos each (frac 1/2)


def test_min_points_filter(nusc_root):
    cfg = _dataset_cfg()
    cfg['FILTER_MIN_POINTS_IN_GT'] = 11  # above the stored 10
    ds = NuScenesDataset(cfg, class_names=['car', 'truck'],
                         training=False, root_path=nusc_root)
    item = ds[0]
    assert (item['gt_boxes'][:, 3] > 0).sum() == 0 or \
        len(item['gt_boxes']) == 0


def test_global_frame_predictions(nusc_root, tmp_path):
    ds = NuScenesDataset(_dataset_cfg(), class_names=['car', 'truck'],
                         training=False, root_path=nusc_root)
    boxes = np.array([[2.0, 1.0, 0.0, 4.0, 2.0, 1.5, 0.3]], np.float32)
    annos = ds.generate_prediction_dicts(
        {'metadata': [{'token': 'tok1'}]},
        [{'pred_scores': np.array([0.9]), 'pred_boxes': boxes,
          'pred_labels': np.array([1])}],
        class_names=['car', 'truck'], output_path=tmp_path)
    # --save_to_file writes per-frame global-frame submission rows
    import json
    saved = json.loads((tmp_path / 'tok1.json').read_text())
    assert saved[0]['detection_name'] == 'car'
    assert np.allclose(saved[0]['translation'], [103.0, 51.0, 0.0], atol=1e-5)
    results = ds.annos_to_nusc_results(annos)
    det = results['tok1'][0]
    # ref_to_global for sample 1 translates by (101, 50, 0)
    assert np.allclose(det['translation'], [103.0, 51.0, 0.0], atol=1e-5)
    assert det['size'] == [2.0, 4.0, 1.5]  # (w, l, h) order
    q = det['rotation']
    assert np.isclose(2 * np.arctan2(q[3], q[0]), 0.3, atol=1e-6)
    assert det['detection_name'] == 'car'


def test_transform_round_trip():
    rng = np.random.default_rng(3)
    yaw = 0.7
    tm = np.eye(4, dtype=np.float32)
    tm[:2, :2] = [[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]]
    tm[:3, 3] = [5.0, -1.0, 2.0]
    boxes = np.concatenate([
        rng.uniform(-5, 5, (4, 3)), rng.uniform(1, 3, (4, 3)),
        rng.uniform(-np.pi, np.pi, (4, 1))], axis=1).astype(np.float32)
    out = boxes_lidar_to_global(boxes, tm)
    assert np.allclose(out[:, :3], transform_points(boxes[:, :3], tm), atol=1e-5)
    assert np.allclose(out[:, 6], boxes[:, 6] + yaw, atol=1e-5)


def test_center_distance_ap(nusc_root):
    ds = NuScenesDataset(_dataset_cfg(), class_names=['car', 'truck'],
                         training=False, root_path=nusc_root)
    # perfect predictions: every gt reproduced with high score
    det_annos = []
    for info in ds.infos:
        det_annos.append({
            'name': np.asarray(info['gt_names']),
            'score': np.array([0.9, 0.8]),
            'boxes_lidar': np.asarray(info['gt_boxes']),
            'pred_labels': np.array([1, 2]),
            'metadata': {'token': info['token']},
        })
    result_str, result_dict = ds.evaluation(det_annos, ['car', 'truck'])
    assert result_dict['car/mAP'] == pytest.approx(1.0)
    assert result_dict['truck/mAP'] == pytest.approx(1.0)

    # far-off predictions match nothing
    bad = [{**a, 'boxes_lidar': a['boxes_lidar'] + np.array(
        [50.0, 50.0, 0, 0, 0, 0, 0], np.float32)} for a in det_annos]
    _, bad_dict = ds.evaluation(bad, ['car', 'truck'])
    assert bad_dict['car/mAP'] == 0.0


def test_build_dataloader_registry(nusc_root):
    from hvpr_tpu.datasets import build_dataloader
    cfg = _dataset_cfg()
    dataset, loader, sampler = build_dataloader(
        dataset_cfg=cfg, class_names=['car', 'truck'], batch_size=2,
        dist=False, root_path=nusc_root, workers=0, training=True)
    assert isinstance(dataset, NuScenesDataset)
    batch = next(iter(loader))
    assert batch['batch_size'] == 2
    assert batch['voxels'].shape[0] == 2
    assert batch['gt_boxes'].shape[0] == 2


def _rand_pose(rng):
    ax = rng.normal(size=3)
    ax /= np.linalg.norm(ax)
    ang = rng.uniform(-np.pi, np.pi)
    q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * ax])
    return {'translation': rng.uniform(-10, 10, 3).tolist(),
            'rotation': q.tolist()}


def test_pose_math():
    from hvpr_tpu.datasets.nuscenes import nuscenes_utils as nu
    rng = np.random.default_rng(11)
    pose = _rand_pose(rng)
    tm = nu.pose_to_matrix(pose)
    inv = nu.pose_to_matrix(pose, inverse=True)
    assert np.allclose(tm @ inv, np.eye(4), atol=1e-10)
    # rotation matrix is orthonormal with det +1
    r = tm[:3, :3]
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-10)
    assert np.isclose(np.linalg.det(r), 1.0)
    # pure-yaw quaternion round-trips through quaternion_yaw
    yaw = 1.1
    q = [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]
    assert np.isclose(nu.quaternion_yaw(q), yaw, atol=1e-12)


def test_sweep_to_ref_transform_oracle():
    """Composed sweep->ref matrix must equal mapping a point through each
    frame hop explicitly."""
    from hvpr_tpu.datasets.nuscenes import nuscenes_utils as nu
    rng = np.random.default_rng(5)
    ref_cs, ref_pose = _rand_pose(rng), _rand_pose(rng)
    sw_cs, sw_pose = _rand_pose(rng), _rand_pose(rng)
    p_sweep = rng.uniform(-5, 5, 3)

    def apply(pose, p):
        return nu.quaternion_to_rotation(pose['rotation']) @ p + \
            np.asarray(pose['translation'])

    def unapply(pose, p):
        r = nu.quaternion_to_rotation(pose['rotation'])
        return r.T @ (p - np.asarray(pose['translation']))

    p_global = apply(sw_pose, apply(sw_cs, p_sweep))
    expected = unapply(ref_cs, unapply(ref_pose, p_global))

    tm = nu.sweep_to_ref_transform(ref_cs, ref_pose, sw_cs, sw_pose)
    got = tm[:3, :3] @ p_sweep + tm[:3, 3]
    assert np.allclose(got, expected, atol=1e-9)

    # ref_to_global is the exact inverse chain
    rg = nu.ref_to_global_transform(ref_cs, ref_pose)
    assert np.allclose(rg @ nu.sweep_to_ref_transform(
        ref_cs, ref_pose, sw_cs, sw_pose),
        nu.pose_to_matrix(sw_pose) @ nu.pose_to_matrix(sw_cs), atol=1e-9)


def test_global_boxes_to_lidar_round_trip():
    """global_boxes_to_lidar composed with the dataset's
    boxes_lidar_to_global must reproduce the global annotation (for yaw-only
    ego orientations, where box yaw composition is exact)."""
    from hvpr_tpu.datasets.nuscenes import nuscenes_utils as nu
    rng = np.random.default_rng(9)
    yaw_ego = 0.8
    ref_cs = {'translation': [1.0, -0.5, 1.8],
              'rotation': [np.cos(0.2), 0, 0, np.sin(0.2)]}
    ref_pose = {'translation': [30.0, -12.0, 0.1],
                'rotation': [np.cos(yaw_ego / 2), 0, 0, np.sin(yaw_ego / 2)]}
    centers = rng.uniform(-20, 20, (5, 3))
    sizes_wlh = rng.uniform(1, 4, (5, 3))
    yaws = rng.uniform(-np.pi, np.pi, 5)

    boxes_l = nu.global_boxes_to_lidar(centers, sizes_wlh, yaws,
                                       ref_cs, ref_pose)
    rg = nu.ref_to_global_transform(ref_cs, ref_pose).astype(np.float32)
    back = boxes_lidar_to_global(boxes_l, rg)
    assert np.allclose(back[:, :3], centers, atol=1e-4)
    assert np.allclose(back[:, 3], sizes_wlh[:, 1], atol=1e-6)  # l
    assert np.allclose(back[:, 4], sizes_wlh[:, 0], atol=1e-6)  # w
    dyaw = (back[:, 6] - yaws + np.pi) % (2 * np.pi) - np.pi
    assert np.allclose(dyaw, 0, atol=1e-4)


class _MockNusc:
    """Minimal devkit stand-in: flat token->record tables."""

    def __init__(self, tables):
        self.tables = tables

    def get(self, table, token):
        return self.tables[table][token]


def test_fill_infos_with_mock_devkit(tmp_path):
    """fill_infos walked over a mock database produces infos the dataset
    can consume directly (schema + sweep-transform consistency)."""
    from hvpr_tpu.datasets.nuscenes import nuscenes_utils as nu
    rng = np.random.default_rng(2)
    ref_cs, ref_pose = _rand_pose(rng), _rand_pose(rng)
    sw_cs, sw_pose = _rand_pose(rng), _rand_pose(rng)

    tables = {
        'sample': {'s0': {'data': {'LIDAR_TOP': 'sd0'}, 'anns': ['a0'],
                          'scene_token': 'sc0'}},
        'sample_data': {
            'sd0': {'timestamp': 2_000_000, 'filename': 'samples/x.bin',
                    'calibrated_sensor_token': 'cs0', 'ego_pose_token': 'ep0',
                    'prev': 'sd1'},
            'sd1': {'timestamp': 1_950_000, 'filename': 'sweeps/y.bin',
                    'calibrated_sensor_token': 'cs1', 'ego_pose_token': 'ep1',
                    'prev': ''},
        },
        'calibrated_sensor': {'cs0': ref_cs, 'cs1': sw_cs},
        'ego_pose': {'ep0': ref_pose, 'ep1': sw_pose},
        'sample_annotation': {
            # raw nuScenes taxonomy names, as the real database stores them
            'a0': {'translation': [5.0, 2.0, 0.5], 'size': [2.0, 4.5, 1.7],
                   'rotation': [np.cos(0.3), 0, 0, np.sin(0.3)],
                   'category_name': 'vehicle.car', 'num_lidar_pts': 42},
            'a1': {'translation': [8.0, -1.0, 0.2], 'size': [0.5, 0.5, 1.0],
                   'rotation': [1.0, 0, 0, 0],
                   'category_name': 'movable_object.debris',
                   'num_lidar_pts': 3},
        },
    }
    tables['sample']['s0']['anns'] = ['a0', 'a1']
    infos = nu.fill_infos(_MockNusc(tables), ['s0'], max_sweeps=10)
    assert len(infos) == 1
    info = infos[0]
    assert info['lidar_path'] == 'samples/x.bin'
    assert len(info['sweeps']) == 1
    assert np.isclose(info['sweeps'][0]['time_lag'], 0.05)
    assert np.allclose(
        info['sweeps'][0]['transform_matrix'],
        nu.sweep_to_ref_transform(ref_cs, ref_pose, sw_cs, sw_pose),
        atol=1e-5)
    assert info['gt_boxes'].shape == (2, 7)
    # taxonomy names map to detection class names (benchmark contract);
    # non-benchmark categories map to 'ignore' and never match CLASS_NAMES
    assert info['gt_names'][0] == 'car'
    assert info['gt_names'][1] == 'ignore'
    assert info['num_lidar_pts'][0] == 42


def test_yaml_config_loads():
    import os
    from hvpr_tpu.config import cfg_from_yaml_file
    cfg = ConfigDict()
    path = os.path.join(os.path.dirname(__file__), '..',
                        'tools/cfgs/dataset_configs/nuscenes_dataset.yaml')
    cfg_from_yaml_file(path, cfg)
    assert cfg['DATASET'] == 'NuScenesDataset'
    assert cfg['MAX_SWEEPS'] == 10


@pytest.mark.slow
def test_pointpillar_nuscenes_model(nusc_root):
    """pointpillar_nuscenes.yaml end-to-end on the synthetic fixture:
    5-channel multi-sweep points -> PillarVFE -> scatter -> backbone -> head,
    eval forward + training loss (grid shrunk to the fixture's range)."""
    import os
    import jax
    import jax.numpy as jnp
    from hvpr_tpu.config import cfg_from_yaml_file
    from hvpr_tpu.models import build_network

    cfg = ConfigDict()
    path = os.path.join(os.path.dirname(__file__), '..',
                        'tools/cfgs/nuscenes_models/pointpillar_nuscenes.yaml')
    cfg_from_yaml_file(path, cfg)
    class_names = cfg['CLASS_NAMES']

    data_cfg = _dataset_cfg()  # small-range override for CPU speed
    ds = NuScenesDataset(data_cfg, class_names=class_names, training=True,
                         root_path=nusc_root)
    batch_np = ds.collate_batch([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k not in ('batch_size', 'frame_id', 'metadata')}
    assert batch['voxels'].shape[-1] == 5  # x y z intensity time

    net = build_network(cfg['MODEL'], num_class=len(class_names), dataset=ds)
    variables = net.init(jax.random.PRNGKey(0), batch, train=True)

    out = net.module.apply(variables, batch, train=False)
    n_anchor_cols = len(class_names)
    assert out['batch_cls_preds'].shape[-1] == n_anchor_cols
    assert out['batch_box_preds'].shape[-1] == 7
    assert np.all(np.isfinite(np.asarray(out['batch_cls_preds'])))

    loss, _ = net.train_forward(variables, batch)
    assert np.isfinite(float(loss))
