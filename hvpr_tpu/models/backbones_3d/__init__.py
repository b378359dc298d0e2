from .pointnet2_backbone import PointNet2MSG, PointNet2MSG_NOFP
from .sparse_backbone import VoxelBackBone8xSparse
from .spconv_backbone import (UNetV2, VoxelBackBone8x as VoxelBackBone8xDense,
                              VoxelResBackBone8x)


class PointNet2Backbone:
    """Stack-variant PointNet++ backbone.

    The reference hard-disables this class with an assert
    (pointnet2_backbone.py:174-179: 'DO NOT USE THIS CURRENTLY SINCE IT MAY
    HAVE POTENTIAL BUGS'); registered for config parity with the same
    behavior.
    """

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            'PointNet2Backbone (stack variant) is disabled upstream; use PointNet2MSG')


__all__ = {
    'PointNet2MSG': PointNet2MSG,
    'PointNet2MSG_NOFP': PointNet2MSG_NOFP,
    'PointNet2Backbone': PointNet2Backbone,
    # true sparse convs (reference spconv semantics, production grids)
    'VoxelBackBone8x': VoxelBackBone8xSparse,
    # dense NDHWC fallback (exact, coarse grids only)
    'VoxelBackBone8xDense': VoxelBackBone8xDense,
    'VoxelResBackBone8x': VoxelResBackBone8x,
    'VoxelBackBone8x_voxelrcnn': VoxelBackBone8xSparse,
    'UNetV2': UNetV2,
}
