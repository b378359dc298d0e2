"""Multi-class heads: 3-class AnchorHeadSingle, AnchorHeadMulti, per-class NMS."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvpr_tpu.config import ConfigDict
from tests.test_model import TINY_GRID, tiny_model_cfg, make_batch, _FakeDataset


class _FakeDataset3(_FakeDataset):
    class_names = ['Car', 'Pedestrian', 'Cyclist']


def multiclass_cfg(head_name='AnchorHeadSingle'):
    cfg = tiny_model_cfg()
    head = cfg['DENSE_HEAD']
    head['NAME'] = head_name
    head['ANCHOR_GENERATOR_CONFIG'] = [
        {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
         'align_center': False, 'feature_map_stride': 2,
         'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
        {'class_name': 'Pedestrian', 'anchor_sizes': [[0.8, 0.6, 1.73]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
         'align_center': False, 'feature_map_stride': 2,
         'matched_threshold': 0.5, 'unmatched_threshold': 0.35},
        {'class_name': 'Cyclist', 'anchor_sizes': [[1.76, 0.6, 1.73]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
         'align_center': False, 'feature_map_stride': 2,
         'matched_threshold': 0.5, 'unmatched_threshold': 0.35},
    ]
    cfg['POST_PROCESSING']['NMS_CONFIG']['MULTI_CLASSES_NMS'] = True
    if head_name == 'AnchorHeadMulti':
        head['SHARED_CONV_NUM_FILTER'] = 32
        head['RPN_HEAD_CFGS'] = [
            {'HEAD_CLS_NAME': ['Car']},
            {'HEAD_CLS_NAME': ['Pedestrian', 'Cyclist']},
        ]
    return cfg


def make_mc_batch(rng):
    batch = make_batch(rng, batch_size=2)
    gt = np.zeros((2, 4, 8), np.float32)
    gt[:, 0] = [2.5, 0.0, -1.0, 3.9, 1.6, 1.56, 0.3, 1]   # Car
    gt[:, 1] = [4.0, 1.0, -0.8, 0.8, 0.6, 1.73, 0.0, 2]   # Pedestrian
    gt[:, 2] = [1.5, -1.0, -0.8, 1.76, 0.6, 1.73, -0.5, 3]  # Cyclist
    batch = dict(batch)
    batch['gt_boxes'] = jnp.asarray(gt)
    return batch


def _run(head_name):
    from hvpr_tpu.models import build_network
    cfg = multiclass_cfg(head_name)
    net = build_network(cfg, num_class=3, dataset=_FakeDataset3())
    rng = np.random.default_rng(0)
    batch = make_mc_batch(rng)
    net.init(jax.random.PRNGKey(0), batch)

    loss, (tb, _) = net.train_forward(net.variables, batch)
    assert np.isfinite(float(loss)), tb

    out = net.eval_forward(batch)
    # per-class NMS output: 3 * post_maxsize slots
    assert out['pred_boxes'].shape[1] == 3 * 32
    assert set(np.unique(np.asarray(out['pred_labels']))) <= {1, 2, 3}
    return out


@pytest.mark.slow
def test_anchor_head_single_multiclass():
    _run('AnchorHeadSingle')


def test_anchor_head_multi():
    _run('AnchorHeadMulti')
