"""World-level augmentation primitives (host-side numpy).

Parity target: /root/reference/pcdet/datasets/augmentor/augmentor_utils.py
(random_flip_along_x/y:6-41, global_rotation:44-62, global_scaling:65-78) —
each transforms (gt_boxes, points) jointly.
"""

import numpy as np

from ...utils import common_utils


def random_flip_along_x(gt_boxes, points):
    """Flip y (50% chance): y -> -y, heading -> -heading."""
    enable = np.random.choice([False, True], replace=False, p=[0.5, 0.5])
    if enable:
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]
        points[:, 1] = -points[:, 1]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 8] = -gt_boxes[:, 8]
    return gt_boxes, points


def random_flip_along_y(gt_boxes, points):
    """Flip x (50% chance): x -> -x, heading -> -(heading + pi)."""
    enable = np.random.choice([False, True], replace=False, p=[0.5, 0.5])
    if enable:
        gt_boxes[:, 0] = -gt_boxes[:, 0]
        gt_boxes[:, 6] = -(gt_boxes[:, 6] + np.pi)
        points[:, 0] = -points[:, 0]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]
    return gt_boxes, points


def global_rotation(gt_boxes, points, rot_range):
    noise_rotation = np.random.uniform(rot_range[0], rot_range[1])
    points = common_utils.rotate_points_along_z(
        points[np.newaxis, :, :], np.array([noise_rotation]))[0]
    gt_boxes[:, 0:3] = common_utils.rotate_points_along_z(
        gt_boxes[np.newaxis, :, 0:3], np.array([noise_rotation]))[0]
    gt_boxes[:, 6] += noise_rotation
    if gt_boxes.shape[1] > 7:
        vel = np.hstack([gt_boxes[:, 7:9],
                         np.zeros((gt_boxes.shape[0], 1), dtype=gt_boxes.dtype)])
        gt_boxes[:, 7:9] = common_utils.rotate_points_along_z(
            vel[np.newaxis, :, :], np.array([noise_rotation]))[0][:, 0:2]
    return gt_boxes, points


def global_scaling(gt_boxes, points, scale_range):
    if scale_range[1] - scale_range[0] < 1e-3:
        return gt_boxes, points
    noise_scale = np.random.uniform(scale_range[0], scale_range[1])
    points[:, :3] *= noise_scale
    gt_boxes[:, :6] *= noise_scale
    return gt_boxes, points
