from . import nms, pointnet2, points_in_boxes, rotated_iou, scatter, voxelizer  # noqa: F401
