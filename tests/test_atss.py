"""ATSS target assigner on toy scenes.

Parity target: pcdet/models/dense_heads/target_assigner/atss_target_assigner.py
(top-k by center distance, mean+unbiased-std IoU threshold + 1e-6,
center-in-gt test, per-gt force match, per-anchor-set selection).
"""

import jax.numpy as jnp
import numpy as np

from hvpr_tpu.models.dense_heads.target_assigner.atss_target_assigner import (
    ATSSTargetAssigner,
)
from hvpr_tpu.utils.box_coder_utils import ResidualCoder


def _anchor_grid(x0, n=6, spacing=2.0):
    """(1, n, n, 1, 1, 7) axis-aligned car anchors on a grid starting at x0."""
    anchors = np.zeros((1, n, n, 1, 1, 7), np.float32)
    xs = x0 + np.arange(n) * spacing
    ys = np.arange(n) * spacing
    anchors[0, :, :, 0, 0, 0] = xs[None, :]
    anchors[0, :, :, 0, 0, 1] = ys[:, None]
    anchors[..., 3:6] = [3.9, 1.6, 1.56]
    return anchors


def _gt(x, y, cls_id=1):
    box = np.array([[x, y, 0.0, 3.9, 1.6, 1.56, 0.0, cls_id]], np.float32)
    return jnp.asarray(box[None])  # (1, 1, 8)


def test_atss_assigns_on_gt_and_respects_center_test():
    assigner = ATSSTargetAssigner(topk=9, box_coder=ResidualCoder())
    anchors = _anchor_grid(0.0)
    gt = _gt(4.0, 4.0)  # exactly on the (2, 2) grid anchor
    out = assigner.assign_targets([anchors], gt)
    labels = np.asarray(out['box_cls_labels'][0])
    assert labels.shape == (36,)
    fg = labels > 0
    # the exact-overlap anchor is foreground (force match guarantees >= 1)
    assert fg.sum() >= 1
    assert labels.reshape(6, 6)[2, 2] == 1
    # every foreground anchor's center lies inside the gt bev box
    centers = anchors.reshape(-1, 7)[fg]
    assert (np.abs(centers[:, 0] - 4.0) <= 3.9 / 2 + 1e-5).all()
    assert (np.abs(centers[:, 1] - 4.0) <= 1.6 / 2 + 1e-5).all()
    # reg weights are 1.0 on fg (reference sets 1.0, no count normalization)
    weights = np.asarray(out['reg_weights'][0])
    assert set(np.unique(weights)) <= {0.0, 1.0}
    assert ((weights > 0) == fg).all()


def test_atss_padded_gts_claim_nothing():
    assigner = ATSSTargetAssigner(topk=9, box_coder=ResidualCoder())
    anchors = _anchor_grid(0.0)
    gt = jnp.zeros((1, 3, 8), jnp.float32)  # all padded
    out = assigner.assign_targets([anchors], gt)
    assert (np.asarray(out['box_cls_labels']) == 0).all()


def test_atss_per_set_selection_is_independent():
    """Each anchor set runs its own top-k/threshold (reference loops sets).

    Regression: a joint top-k over the union of sets let a second (far-away)
    set displace the first set's candidate pool and shift its adaptive
    threshold."""
    assigner = ATSSTargetAssigner(topk=9, box_coder=ResidualCoder())
    set_a = _anchor_grid(0.0)
    set_b = _anchor_grid(500.0)  # far from the gt; must not perturb set A
    gt = _gt(4.0, 4.0)

    solo = np.asarray(assigner.assign_targets([set_a], gt)['box_cls_labels'][0])
    both = np.asarray(
        assigner.assign_targets([set_a, set_b], gt)['box_cls_labels'][0])
    # output interleaves sets per BEV location: (loc, set*ns*nr) -> columns
    both2 = both.reshape(36, 2)
    np.testing.assert_array_equal(both2[:, 0], solo)
    assert (both2[:, 1] == 0).all()  # far set has no positives
