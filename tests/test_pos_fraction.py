"""POS_FRACTION fg/bg subsampling in the axis-aligned assigner (VERDICT r2 #6).

Reference parity: pcdet/models/dense_heads/target_assigner/
axis_aligned_target_assigner.py:173-185 — cap foregrounds at
pos_fraction*sample_size, fill the rest of the sample_size budget with
randomly sampled backgrounds, ignore (-1) everything else.
"""

import jax.numpy as jnp
import numpy as np

from hvpr_tpu.models.dense_heads.target_assigner.axis_aligned_target_assigner import (
    AxisAlignedTargetAssigner,
)
from hvpr_tpu.utils.box_coder_utils import ResidualCoder


def _make_assigner(pos_fraction, sample_size=32):
    cfg = {
        'ANCHOR_GENERATOR_CONFIG': [{
            'class_name': 'Car',
            'matched_threshold': 0.6,
            'unmatched_threshold': 0.45,
        }],
        'TARGET_ASSIGNER_CONFIG': {
            'POS_FRACTION': pos_fraction,
            'SAMPLE_SIZE': sample_size,
            'NORM_BY_NUM_EXAMPLES': False,
        },
    }
    return AxisAlignedTargetAssigner(cfg, ['Car'], ResidualCoder())


def _toy_scene():
    """(1, 4, 8, 2, 1, 7) anchor grid: two rows of gt-identical anchors
    (32 foregrounds) + rows of far-away anchors (backgrounds)."""
    gt = np.array([[10.0, 10.0, 0.0, 3.9, 1.6, 1.56, 0.0]], np.float32)
    anchors = np.zeros((1, 4, 8, 2, 1, 7), np.float32)
    anchors[..., 3:6] = [3.9, 1.6, 1.56]
    # rows 0-1: exactly on the gt -> IoU 1 (fg); rows 2-3: 100 m away (bg)
    anchors[:, :2, ..., 0:2] = 10.0
    anchors[:, 2:, ..., 0] = 100.0
    anchors[:, 2:, ..., 1] = np.arange(8)[None, None, :, None, None] * 20.0
    gt_with_cls = np.concatenate([gt, np.ones((1, 1), np.float32)], axis=1)
    return [anchors], jnp.asarray(gt_with_cls[None])  # batch of 1


def test_subsampling_budgets():
    assigner = _make_assigner(pos_fraction=0.5, sample_size=32)
    anchors, gt = _toy_scene()
    out = assigner.assign_targets(anchors, gt)
    labels = np.asarray(out['box_cls_labels'][0])

    n_fg, n_bg = (labels > 0).sum(), (labels == 0).sum()
    assert n_fg == 16, n_fg                      # capped at 0.5 * 32
    assert n_fg + n_bg == 32, (n_fg, n_bg)       # budget filled with bg
    assert (labels == -1).sum() == labels.size - 32
    # every kept foreground is a true-overlap anchor (first two grid rows)
    fg_slots = np.where(labels.reshape(4, 8, 2) > 0)[0]
    assert (fg_slots < 2).all()
    # reg weights follow the surviving foregrounds only
    weights = np.asarray(out['reg_weights'][0])
    assert ((weights > 0) == (labels > 0)).all()


def test_subsampling_deterministic_and_data_dependent():
    assigner = _make_assigner(pos_fraction=0.5, sample_size=32)
    anchors, gt = _toy_scene()
    a = np.asarray(assigner.assign_targets(anchors, gt)['box_cls_labels'])
    b = np.asarray(assigner.assign_targets(anchors, gt)['box_cls_labels'])
    np.testing.assert_array_equal(a, b)          # same data -> same draw
    gt2 = gt.at[0, 0, 0].add(0.5)
    c = np.asarray(assigner.assign_targets(anchors, gt2)['box_cls_labels'])
    assert not np.array_equal(a, c)              # different data -> new draw


def test_keep_all_fallbacks():
    # fewer fg than the cap and fewer bg than the budget: keep everything
    assigner = _make_assigner(pos_fraction=0.5, sample_size=512)
    anchors, gt = _toy_scene()
    labels = np.asarray(assigner.assign_targets(anchors, gt)['box_cls_labels'][0])
    assert (labels > 0).sum() == 32              # all 32 fg kept (< 256 cap)
    assert (labels == 0).sum() == labels.size - 32  # all bg kept (< 480)


def test_disabled_matches_reference_default():
    # POS_FRACTION -1 (the shipped configs): no subsampling at all
    assigner = _make_assigner(pos_fraction=-1.0)
    anchors, gt = _toy_scene()
    labels = np.asarray(assigner.assign_targets(anchors, gt)['box_cls_labels'][0])
    assert (labels > 0).sum() == 32
    assert (labels == -1).sum() == 0             # every anchor labeled fg or bg


def test_pos_fraction_zero_is_not_unset():
    # POS_FRACTION 0.0 is a VALID setting (cap fg at zero, sample only
    # backgrounds) — it must not fall into the disabled (-1) path
    assigner = _make_assigner(pos_fraction=0.0, sample_size=32)
    anchors, gt = _toy_scene()
    labels = np.asarray(assigner.assign_targets(anchors, gt)['box_cls_labels'][0])
    assert (labels > 0).sum() == 0               # every fg disabled to -1
    assert (labels == 0).sum() == 32             # full budget of backgrounds


def test_global_step_resamples_repeated_batch():
    # same batch revisited at a different train step draws a fresh subsample
    # (the reference resamples per call); same step stays deterministic
    assigner = _make_assigner(pos_fraction=0.5, sample_size=32)
    anchors, gt = _toy_scene()
    a = np.asarray(assigner.assign_targets(
        anchors, gt, global_step=0)['box_cls_labels'])
    b = np.asarray(assigner.assign_targets(
        anchors, gt, global_step=0)['box_cls_labels'])
    c = np.asarray(assigner.assign_targets(
        anchors, gt, global_step=1)['box_cls_labels'])
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
