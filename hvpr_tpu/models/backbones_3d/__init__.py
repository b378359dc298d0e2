from .pointnet2_backbone import PointNet2MSG, PointNet2MSG_NOFP

__all__ = {
    'PointNet2MSG': PointNet2MSG,
    'PointNet2MSG_NOFP': PointNet2MSG_NOFP,
}
