"""Host data-layer edge cases (review regressions).

- gt-database sampler with an EMPTY class (db built without it, or PREPARE
  filters removed every entry) must construct, filter, and draw cleanly;
- sample_points on an empty scan must not crash the dataloader worker;
- NUM_POINTS -1 ('keep all', upstream convention) must collate to the
  per-batch max instead of np.zeros((b, -1, c));
- equal-shape ndarray extras (image_shape) stack to (B, ...) in collate.
"""

import numpy as np

from hvpr_tpu.config import ConfigDict
from hvpr_tpu.datasets.augmentor.database_sampler import _ClassDb
from hvpr_tpu.datasets.dataset import DatasetTemplate
from hvpr_tpu.datasets.processor.data_processor import DataProcessor


def test_class_db_empty():
    db = _ClassDb([])
    assert len(db) == 0
    assert db.boxes.shape == (0, 7)
    assert db.draw(3).size == 0
    assert len(db.keep(np.zeros(0, bool))) == 0


def _processor(num_points):
    cfg = [ConfigDict({'NAME': 'sample_points',
                       'NUM_POINTS': {'train': num_points,
                                      'test': num_points}})]
    return DataProcessor(cfg, point_cloud_range=np.array(
        [0, -40, -3, 70.4, 40, 1], np.float32), training=True)


def test_sample_points_empty_scan():
    proc = _processor(64)
    out = proc.forward({'points': np.zeros((0, 4), np.float32)})
    assert out['points'].shape[0] == 0  # passes through; collate pads


def _template(num_points):
    cfg = ConfigDict({
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity'],
            'src_feature_list': ['x', 'y', 'z', 'intensity'],
        },
        'POINT_CLOUD_RANGE': [0, -40, -3, 70.4, 40, 1],
        'DATA_PROCESSOR': [
            {'NAME': 'sample_points',
             'NUM_POINTS': {'train': num_points, 'test': num_points}},
        ],
    })
    return DatasetTemplate(dataset_cfg=cfg, class_names=['Car'],
                           training=False, root_path='/tmp')


def test_collate_num_points_keep_all():
    ds = _template(-1)
    rng = np.random.default_rng(0)
    items = [{'points': rng.normal(size=(n, 4)).astype(np.float32)}
             for n in (5, 9)]
    batch = ds.collate_batch(items)
    assert batch['points'].shape == (2, 9, 4)   # per-batch max, not -1
    assert batch['point_valid_mask'].sum() == 14


def test_collate_stacks_equal_shape_ndarray_extras():
    ds = _template(8)
    rng = np.random.default_rng(0)
    items = [{'points': rng.normal(size=(8, 4)).astype(np.float32),
              'image_shape': np.array([375, 1242]),
              'frame_id': f'{i:06d}'} for i in range(2)]
    batch = ds.collate_batch(items)
    assert isinstance(batch['image_shape'], np.ndarray)
    assert batch['image_shape'].shape == (2, 2)
    assert batch['frame_id'] == ['000000', '000001']  # strings stay a list
