"""Dataset registry + dataloader factory.

Parity target: /root/reference/pcdet/datasets/__init__.py (registry:11-15,
padded eval DistributedSampler:18-38, build_dataloader:41-70).

The loader uses torch.utils.data.DataLoader (CPU) purely as a multiprocess
host input pipeline — batches are fixed-shape numpy dicts handed to JAX.
Multi-host sharding replaces the DistributedSampler: each JAX process takes a
strided slice of the sample index space (same padding semantics as the
reference's eval sampler).
"""

import numpy as np
import torch.utils.data as torch_data

from .dataset import DatasetTemplate
from .kitti.kitti_dataset import KittiDataset
from .nuscenes.nuscenes_dataset import NuScenesDataset

__all__ = {
    'DatasetTemplate': DatasetTemplate,
    'KittiDataset': KittiDataset,
    'NuScenesDataset': NuScenesDataset,
}


class _StridedEvalSampler(torch_data.Sampler):
    """Pad to a multiple of world_size, then stride-slice (reference:18-38)."""

    def __init__(self, dataset, world_size, rank):
        self.total = len(dataset)
        self.world_size = world_size
        self.rank = rank
        self.num_samples = -(-self.total // world_size)

    def __iter__(self):
        indices = list(range(self.total))
        indices += indices[:self.num_samples * self.world_size - self.total]
        return iter(indices[self.rank::self.world_size])

    def __len__(self):
        return self.num_samples


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False,
                     root_path=None, workers=4, logger=None, training=True,
                     merge_all_iters_to_one_epoch=False, total_epochs=0,
                     seed=None):
    dataset = __all__[dataset_cfg['DATASET']](
        dataset_cfg=dataset_cfg,
        class_names=class_names,
        root_path=root_path,
        training=training,
        logger=logger,
    )

    if merge_all_iters_to_one_epoch:
        assert hasattr(dataset, 'merge_all_iters_to_one_epoch')
        dataset.merge_all_iters_to_one_epoch(merge=True, epochs=total_epochs)

    sampler = None
    if dist:
        from ..utils.common_utils import get_dist_info
        rank, world_size = get_dist_info()
        if training:
            sampler = torch_data.distributed.DistributedSampler(
                dataset, num_replicas=world_size, rank=rank)
        else:
            sampler = _StridedEvalSampler(dataset, world_size, rank)

    def _worker_init(worker_id):
        if seed is not None:
            np.random.seed(seed + worker_id)

    dataloader = torch_data.DataLoader(
        dataset, batch_size=batch_size, pin_memory=False, num_workers=workers,
        shuffle=(sampler is None) and training, collate_fn=dataset.collate_batch,
        drop_last=training, sampler=sampler, timeout=0,
        worker_init_fn=_worker_init if seed is not None else None,
    )
    return dataset, dataloader, sampler
