"""Point-in-rotated-box tests — host (numpy/C++) and device (JAX).

TPU-native replacement for the reference ``roiaware_pool3d_utils.points_in_boxes_cpu``
(imported at kitti_dataset.py:7 and box_utils.py:6; CUDA ext commented out in
setup.py:63-70). Used by gt-database creation and pasted-box point removal.
"""

import jax
import jax.numpy as jnp
import numpy as np


def points_in_boxes_cpu(points, boxes):
    """Host-side test.

    Args:
        points: (N, 3) numpy.
        boxes: (M, 7) [x, y, z, dx, dy, dz, heading] (z = box center).
    Returns:
        (M, N) int mask — 1 where point n is inside box m.
    """
    points = np.asarray(points, dtype=np.float32)
    boxes = np.asarray(boxes, dtype=np.float32)
    if boxes.shape[0] == 0 or points.shape[0] == 0:
        return np.zeros((boxes.shape[0], points.shape[0]), dtype=np.int32)
    from ..native import geometry as native_geometry
    if native_geometry.available():
        return native_geometry.points_in_boxes(points, boxes)

    dx = points[None, :, 0] - boxes[:, None, 0]
    dy = points[None, :, 1] - boxes[:, None, 1]
    dz = points[None, :, 2] - boxes[:, None, 2]
    cosa = np.cos(boxes[:, 6])[:, None]
    sina = np.sin(boxes[:, 6])[:, None]
    local_x = dx * cosa + dy * sina
    local_y = -dx * sina + dy * cosa
    in_box = ((np.abs(local_x) <= boxes[:, None, 3] / 2)
              & (np.abs(local_y) <= boxes[:, None, 4] / 2)
              & (np.abs(dz) <= boxes[:, None, 5] / 2))
    return in_box.astype(np.int32)


@jax.jit
def points_in_boxes_jax(points, boxes):
    """Device-side test: (N, 3) points x (M, 7) boxes -> (M, N) bool."""
    dx = points[None, :, 0] - boxes[:, None, 0]
    dy = points[None, :, 1] - boxes[:, None, 1]
    dz = points[None, :, 2] - boxes[:, None, 2]
    cosa = jnp.cos(boxes[:, 6])[:, None]
    sina = jnp.sin(boxes[:, 6])[:, None]
    local_x = dx * cosa + dy * sina
    local_y = -dx * sina + dy * cosa
    return ((jnp.abs(local_x) <= boxes[:, None, 3] / 2)
            & (jnp.abs(local_y) <= boxes[:, None, 4] / 2)
            & (jnp.abs(dz) <= boxes[:, None, 5] / 2))
