"""Geometry utils, box codecs (encode∘decode≈id), losses, config system."""

import numpy as np
import jax.numpy as jnp

from hvpr_tpu.config import ConfigDict, cfg_from_list, merge_new_config
from hvpr_tpu.utils import box_coder_utils, box_utils, common_utils, loss_utils


def test_limit_period():
    vals = np.array([0.0, np.pi, -np.pi, 3 * np.pi, 0.5])
    out = common_utils.limit_period(vals, offset=0.5, period=2 * np.pi)
    assert np.all(out >= -np.pi) and np.all(out < np.pi)
    np.testing.assert_allclose(np.sin(out), np.sin(vals), atol=1e-6)
    np.testing.assert_allclose(np.cos(out), np.cos(vals), atol=1e-6)


def test_rotate_points_along_z():
    pts = np.array([[[1.0, 0.0, 0.0, 7.0]]], dtype=np.float32)
    out = common_utils.rotate_points_along_z(pts, np.array([np.pi / 2], dtype=np.float32))
    np.testing.assert_allclose(out[0, 0, :3], [0, 1, 0], atol=1e-6)
    assert out[0, 0, 3] == 7.0
    # jax input path
    out_j = common_utils.rotate_points_along_z(jnp.asarray(pts), jnp.asarray([np.pi / 2], dtype=np.float32))
    np.testing.assert_allclose(np.asarray(out_j)[0, 0, :3], [0, 1, 0], atol=1e-5)


def test_boxes_to_corners_3d():
    box = np.array([[0, 0, 0, 4, 2, 1.5, 0]], dtype=np.float32)
    corners = box_utils.boxes_to_corners_3d(box)
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(corners[:, :, 0].max(), 2.0, atol=1e-6)
    np.testing.assert_allclose(corners[:, :, 1].max(), 1.0, atol=1e-6)
    np.testing.assert_allclose(corners[:, :, 2].max(), 0.75, atol=1e-6)


def test_residual_coder_roundtrip():
    rng = np.random.default_rng(0)
    n = 32
    anchors = np.zeros((n, 7), dtype=np.float32)
    anchors[:, 0:3] = rng.uniform(-10, 10, size=(n, 3))
    anchors[:, 3:6] = rng.uniform(1, 4, size=(n, 3))
    anchors[:, 6] = rng.uniform(-np.pi, np.pi, size=n)
    boxes = anchors + rng.normal(0, 0.2, size=(n, 7)).astype(np.float32)
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.5

    coder = box_coder_utils.ResidualCoder()
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    dec = np.asarray(coder.decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec, boxes, atol=1e-4)


def test_residual_coder_sincos_roundtrip():
    anchors = np.array([[0, 0, 0, 3.9, 1.6, 1.56, 0.0]], dtype=np.float32)
    boxes = np.array([[0.5, -0.3, 0.1, 4.0, 1.5, 1.6, 0.4]], dtype=np.float32)
    coder = box_coder_utils.ResidualCoder(encode_angle_by_sincos=True)
    assert coder.code_size == 8
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    dec = np.asarray(coder.decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-4)
    np.testing.assert_allclose(np.sin(dec[:, 6]), np.sin(boxes[:, 6]), atol=1e-4)


def test_focal_loss_basics():
    loss_fn = loss_utils.SigmoidFocalClassificationLoss()
    logits = jnp.array([[[10.0], [-10.0]]])
    targets = jnp.array([[[1.0], [0.0]]])
    weights = jnp.array([[1.0, 1.0]])
    loss = loss_fn(logits, targets, weights)
    assert float(loss.sum()) < 1e-3  # perfect predictions -> ~0 loss

    bad = loss_fn(-logits, targets, weights)
    assert float(bad.sum()) > 1.0


def test_smooth_l1():
    loss_fn = loss_utils.WeightedSmoothL1Loss(code_weights=[1.0] * 7)
    pred = jnp.zeros((1, 2, 7))
    tgt = jnp.ones((1, 2, 7)) * 2.0
    w = jnp.ones((1, 2))
    loss = loss_fn(pred, tgt, w)
    np.testing.assert_allclose(np.asarray(loss), 2.0 - 0.5 / 9.0, atol=1e-5)


def test_config_dict_and_overrides():
    c = ConfigDict({'A': {'B': 1, 'C': [1, 2]}, 'D': 'x'})
    assert c.A.B == 1
    c2 = merge_new_config(c, {'A': {'B': 5}, 'E': {'F': 2}})
    assert c2.A.B == 5 and c2.A.C == [1, 2] and c2.E.F == 2

    cfg_from_list(['A.B', '9', 'D', 'hello'], config=c2)
    assert c2.A.B == 9 and c2.D == 'hello'


def test_nearest_bev_iou():
    a = np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], dtype=np.float32)
    b = np.array([[0, 0, 0, 4, 2, 1.5, np.pi / 2]], dtype=np.float32)  # snaps to swapped dims
    iou = box_utils.boxes3d_nearest_bev_iou(a, b)
    # a: 4x2 aligned; b treated as 2x4 -> inter 2x2=4, union 8+8-4=12
    np.testing.assert_allclose(iou[0, 0], 4.0 / 12.0, atol=1e-5)
