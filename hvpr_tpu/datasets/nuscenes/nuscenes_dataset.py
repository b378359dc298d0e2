"""NuScenes dataset (registered placeholder).

Parity target: the reference registers NuScenesDataset
(datasets/__init__.py:9,14) but its source is absent from the snapshot.
This placeholder keeps registry parity; loading raises with a clear message
until a NuScenes data pipeline lands.
"""

from ..dataset import DatasetTemplate


class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        raise NotImplementedError(
            'NuScenesDataset is registered for config parity; the reference '
            'snapshot also lacks its implementation (SURVEY.md §0). '
            'Use KittiDataset.')
