"""Rotated IoU vs a brute-force rasterization oracle, plus native-lib parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from hvpr_tpu.ops import rotated_iou
from hvpr_tpu.native import geometry as native_geometry


def raster_iou_oracle(box_a, box_b, res=400):
    """Monte-Carlo-free oracle: rasterize both boxes on a fine grid."""
    boxes = np.stack([box_a, box_b])
    lo = boxes[:, 0:2].min(0) - boxes[:, 3:5].max() - 1
    hi = boxes[:, 0:2].max(0) + boxes[:, 3:5].max() + 1
    xs = np.linspace(lo[0], hi[0], res)
    ys = np.linspace(lo[1], hi[1], res)
    xx, yy = np.meshgrid(xs, ys)
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])

    def inside(b):
        dx, dy = xx - b[0], yy - b[1]
        c, s = np.cos(b[6]), np.sin(b[6])
        lx = dx * c + dy * s
        ly = -dx * s + dy * c
        return (np.abs(lx) <= b[3] / 2) & (np.abs(ly) <= b[4] / 2)

    a_in, b_in = inside(box_a), inside(box_b)
    inter = (a_in & b_in).sum() * cell
    union = (a_in | b_in).sum() * cell
    return inter / max(union, 1e-9)


def random_boxes(rng, n):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-3, 3, size=(n, 2))
    boxes[:, 2] = rng.uniform(-1, 1, size=n)
    boxes[:, 3:5] = rng.uniform(0.5, 4.0, size=(n, 2))
    boxes[:, 5] = rng.uniform(0.5, 2.0, size=n)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, size=n)
    return boxes


def test_iou_bev_matches_raster_oracle():
    rng = np.random.default_rng(0)
    boxes_a = random_boxes(rng, 12)
    boxes_b = random_boxes(rng, 12)
    got = np.asarray(rotated_iou.boxes_iou_bev_jit(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    for i in range(6):
        for j in range(6):
            want = raster_iou_oracle(boxes_a[i], boxes_b[j])
            assert abs(got[i, j] - want) < 0.02, (i, j, got[i, j], want)


def test_iou_identical_boxes():
    box = np.array([[1.0, 2.0, 0.0, 3.9, 1.6, 1.56, 0.3]], dtype=np.float32)
    iou = np.asarray(rotated_iou.boxes_iou_bev_jit(jnp.asarray(box), jnp.asarray(box)))
    assert abs(iou[0, 0] - 1.0) < 1e-3
    iou3d = np.asarray(rotated_iou.boxes_iou3d_jit(jnp.asarray(box), jnp.asarray(box)))
    assert abs(iou3d[0, 0] - 1.0) < 1e-3


def test_iou_disjoint_boxes():
    a = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]], dtype=np.float32)
    b = np.array([[10.0, 10.0, 0.0, 1.0, 1.0, 1.0, 0.7]], dtype=np.float32)
    iou = np.asarray(rotated_iou.boxes_iou_bev_jit(jnp.asarray(a), jnp.asarray(b)))
    assert iou[0, 0] == 0.0


def test_abutting_boxes_zero_overlap():
    """Boxes touching along a collinear edge have ZERO intersection.

    Regression: the Green's-theorem edge clipping used to keep the abutting
    (anti-parallel boundary-collinear) segment's full cross term from the
    non-strict pass, reporting origin-dependent spurious overlap (0.5 at the
    origin, ~30 at x~60) and IoU far above 1 after the union clip."""
    def mk(x, y):
        return np.array([[x, y, 0.0, 1.0, 1.0, 1.0, 0.0]], np.float32)

    for x0 in (0.5, 60.5):
        a, b = mk(x0, 0.5), mk(x0 + 1.0, 0.5)
        ov = np.asarray(rotated_iou.boxes_overlap_bev(
            jnp.asarray(a), jnp.asarray(b)))
        iou = np.asarray(rotated_iou.boxes_iou_bev_jit(
            jnp.asarray(a), jnp.asarray(b)))
        assert abs(ov[0, 0]) < 5e-3, (x0, ov)
        assert abs(iou[0, 0]) < 5e-3, (x0, iou)

    # rotated variant: two 45-degree squares abutting along the diagonal
    r = np.pi / 4
    s = np.sqrt(2) / 2
    a = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, r]], np.float32)
    b = np.array([[s, s, 0.0, 1.0, 1.0, 1.0, r]], np.float32)
    ov = np.asarray(rotated_iou.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ov[0, 0]) < 5e-3, ov

    # but a CONTAINED box sharing one boundary edge still counts fully
    a = np.array([[0.5, 0.5, 0.0, 1.0, 1.0, 1.0, 0.0]], np.float32)
    d = np.array([[0.75, 0.5, 0.0, 0.5, 1.0, 1.0, 0.0]], np.float32)
    ov = np.asarray(rotated_iou.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(d)))
    assert abs(ov[0, 0] - 0.5) < 5e-3, ov


def test_axis_aligned_half_overlap():
    a = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]], dtype=np.float32)
    b = np.array([[1.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]], dtype=np.float32)
    iou = np.asarray(rotated_iou.boxes_iou_bev_jit(jnp.asarray(a), jnp.asarray(b)))
    # inter = 2, union = 4 + 4 - 2 = 6
    assert abs(iou[0, 0] - 2.0 / 6.0) < 1e-4


def test_rotated_45_overlap():
    # unit square vs the same square rotated 45 degrees: octagon intersection
    a = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 1.0, 0.0]], dtype=np.float32)
    b = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 1.0, np.pi / 4]], dtype=np.float32)
    iou = np.asarray(rotated_iou.boxes_iou_bev_jit(jnp.asarray(a), jnp.asarray(b)))
    inter = 8 * (np.sqrt(2) - 1)  # regular octagon inscribed in 2x2 square
    want = inter / (4 + 4 - inter)
    assert abs(iou[0, 0] - want) < 1e-3


@pytest.mark.skipif(not native_geometry.available(), reason='no native lib')
def test_native_matches_jax():
    rng = np.random.default_rng(1)
    boxes_a = random_boxes(rng, 16)
    boxes_b = random_boxes(rng, 16)
    got_jax = np.asarray(rotated_iou.boxes_iou_bev_jit(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    got_native = native_geometry.boxes_iou_bev(boxes_a, boxes_b)
    np.testing.assert_allclose(got_jax, got_native, atol=1e-3)

    got_jax3 = np.asarray(rotated_iou.boxes_iou3d_jit(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    got_native3 = native_geometry.boxes_iou3d(boxes_a, boxes_b)
    np.testing.assert_allclose(got_jax3, got_native3, atol=1e-3)
