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


def test_multiclass_hierarchical_nms_busy_class_fallback():
    """VERDICT r4 #8: under MULTI_CLASSES_NMS the hierarchical branch
    predicate takes the max over per-class live counts
    (detector3d_template.py post_processing), so one busy class forces the
    full pre_maxsize path for ALL classes — conservative but correct. Pin
    that both the busy-class (fallback) and all-sparse (stage-1) regimes
    match the single-stage run bit-exactly.
    """
    from hvpr_tpu.models.detectors.detector3d_template import post_processing

    rng = np.random.default_rng(11)
    b, a = 2, 2000
    boxes = np.zeros((b, a, 7), np.float32)
    boxes[..., 0] = rng.uniform(0, 47, (b, a))
    boxes[..., 1] = rng.uniform(-19, 19, (b, a))
    boxes[..., 3:5] = rng.uniform(1.4, 4.2, (b, a, 2))
    boxes[..., 5] = 1.5
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, a))

    def run(probs, stage1):
        cfg = {
            'SCORE_THRESH': 0.1,
            'RECALL_THRESH_LIST': [],
            'NMS_CONFIG': {
                'MULTI_CLASSES_NMS': True,
                'NMS_TYPE': 'nms_gpu',
                'NMS_THRESH': 0.1,
                'NMS_PRE_MAXSIZE': 1024,
                'NMS_STAGE1_MAXSIZE': stage1,
                'NMS_POST_MAXSIZE': 64,
            },
        }
        batch = {'batch_cls_preds': jnp.asarray(probs),
                 'batch_box_preds': jnp.asarray(boxes),
                 'cls_preds_normalized': True}
        return post_processing(batch, cfg, num_class=2)

    def probs_with_live(n_live_per_class):
        p = np.zeros((b, a, 2), np.float32)  # below SCORE_THRESH=0.1
        for c, n_live in enumerate(n_live_per_class):
            for i in range(b):
                idx = rng.choice(a, n_live, replace=False)
                p[i, idx, c] = rng.uniform(0.1, 1.0, n_live)
        return p

    for n_live_per_class in ((400, 10),   # class 0 busy -> fallback branch
                             (20, 15)):   # all sparse -> stage-1 branch
        probs = probs_with_live(n_live_per_class)
        got = run(probs, stage1=128)
        want = run(probs, stage1=1024)    # stage1 >= pre: single-stage path
        for key in ('pred_boxes', 'pred_scores', 'pred_labels', 'pred_mask'):
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(want[key]),
                err_msg=f'{key} mismatch at live={n_live_per_class}')
