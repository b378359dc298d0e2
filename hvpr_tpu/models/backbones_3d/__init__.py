from .pointnet2_backbone import PointNet2MSG, PointNet2MSG_NOFP
from .spconv_backbone import UNetV2, VoxelBackBone8x, VoxelResBackBone8x


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
    'VoxelBackBone8x': VoxelBackBone8x,
    'VoxelResBackBone8x': VoxelResBackBone8x,
    'VoxelBackBone8x_voxelrcnn': VoxelBackBone8x,
    'UNetV2': UNetV2,
}
