"""Detectors: plain PointPillar and the HVPR MixAnchor_Memory (flax).

Parity target: /root/reference/pcdet/models/detectors/pointpillar.py
(PointPillar:4-34; MixAnchor_Memory:37-68 — training runs the point stream,
eval runs module_list[1:] so the PointNet++ backbone is skipped entirely and
memory lookups substitute for point features).
"""

from .detector3d_template import Detector3DTemplate


class PointPillar(Detector3DTemplate):
    """Voxel-stream-only single-stage detector."""

    def __call__(self, batch_dict, train: bool = False):
        batch_dict = dict(batch_dict)   # never mutate the caller's dict
        batch_dict = self.vfe(batch_dict, train)
        batch_dict = self.map_to_bev(batch_dict, train)
        batch_dict = self.backbone_2d(batch_dict, train)
        batch_dict = self.dense_head(batch_dict, train)
        return batch_dict


class MixAnchorMemory(Detector3DTemplate):
    """HVPR: hybrid voxel+point training, memory-substituted inference."""

    def __call__(self, batch_dict, train: bool = False, upto: str = None):
        """``upto`` stops after the named stage (stage profiling only)."""
        batch_dict = dict(batch_dict)   # never mutate the caller's dict
        if train:
            # point stream runs only in training (pointpillar.py:43-45 vs 54-55)
            batch_dict = self.backbone_3d(batch_dict, train)
            if upto == 'backbone_3d':
                return batch_dict
        for name, stage in (('vfe', self.vfe), ('map_to_bev', self.map_to_bev),
                            ('backbone_2d', self.backbone_2d),
                            ('dense_head', self.dense_head)):
            batch_dict = stage(batch_dict, train)
            if upto == name:
                return batch_dict
        return batch_dict
