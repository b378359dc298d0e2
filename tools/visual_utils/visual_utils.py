"""Visualization helpers.

Parity target: /root/reference/tools/visual_utils/visual_utils.py (mayavi 3D
scene rendering draw_scenes:142, draw_corners3d:173) and the numba BEV
rasterizer of tools/vis.py:8-61. The mayavi dependency is replaced by a
matplotlib BEV renderer (headless-safe); the rasterizer is plain numpy.
"""

import numpy as np

from hvpr_tpu.utils import box_utils


def points_to_bev_image(points, point_cloud_range, resolution=0.1):
    """Rasterize points into a BEV intensity/height image (numpy)."""
    pcr = np.asarray(point_cloud_range, dtype=np.float32)
    nx = int(round((pcr[3] - pcr[0]) / resolution))
    ny = int(round((pcr[4] - pcr[1]) / resolution))
    xi = ((points[:, 0] - pcr[0]) / resolution).astype(np.int64)
    yi = ((points[:, 1] - pcr[1]) / resolution).astype(np.int64)
    valid = (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
    img = np.zeros((ny, nx), dtype=np.float32)
    np.maximum.at(img, (yi[valid], xi[valid]),
                  points[valid, 2] - pcr[2])
    return img


def draw_bev_scene(points, pred_boxes=None, gt_boxes=None, save_path=None,
                   point_cloud_range=(0, -40, -3, 70.4, 40, 1), resolution=0.1):
    """Dump a BEV PNG with predicted (green) and gt (red) boxes."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    pcr = np.asarray(point_cloud_range, dtype=np.float32)
    img = points_to_bev_image(points, pcr, resolution)
    fig, ax = plt.subplots(figsize=(12, 12 * img.shape[0] / img.shape[1]))
    ax.imshow(img, origin='lower', cmap='gray',
              extent=[pcr[0], pcr[3], pcr[1], pcr[4]])

    def draw_boxes(boxes, color):
        if boxes is None or len(boxes) == 0:
            return
        corners = box_utils.boxes_to_corners_3d(np.asarray(boxes[:, :7]))[:, :4, :2]
        for c in corners:
            poly = np.concatenate([c, c[:1]], axis=0)
            ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=1.2)

    draw_boxes(pred_boxes, 'lime')
    draw_boxes(gt_boxes, 'red')
    ax.set_xlabel('x (m)')
    ax.set_ylabel('y (m)')
    if save_path is not None:
        fig.savefig(save_path, bbox_inches='tight', dpi=120)
        plt.close(fig)
        return save_path
    return fig
