from .detector3d_template import Detector3DTemplate
from .pointpillar import MixAnchorMemory, PointPillar

__all__ = {
    'Detector3DTemplate': Detector3DTemplate,
    'PointPillar': PointPillar,
    'MixAnchor_Memory': MixAnchorMemory,
}


def build_detector(model_cfg, num_class, dataset):
    """Instantiate a detector flax module from its config NAME (reference
    detectors/__init__.py:11-16)."""
    return __all__[model_cfg['NAME']](
        model_cfg=model_cfg,
        num_class=num_class,
        class_names=dataset.class_names,
        grid_size=tuple(int(g) for g in dataset.grid_size),
        point_cloud_range=tuple(float(v) for v in dataset.point_cloud_range),
        voxel_size=tuple(float(v) for v in dataset.voxel_size),
        num_point_features=dataset.point_feature_encoder.num_point_features
        if hasattr(dataset, 'point_feature_encoder') else 4,
        # bounds the flat-VFE segment scans (PFNLayer max_seg)
        max_points_per_voxel=int(getattr(
            getattr(dataset, 'data_processor', None), 'max_points_per_voxel',
            None) or getattr(dataset, 'max_points_per_voxel', 32)),
    )
