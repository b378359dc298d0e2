"""AP-level A/B of the round-4 TRAIN-path kernel lowerings (VERDICT r4 #6).

test_topk_ap_ab.py bounds the EVAL-path lowering modes on one trained net.
The round-4 kernels change the TRAINING path, so here the A/B trains a
separate net per lowering (identical data, seeds, and step counts) and
compares the resulting official KITTI Car AP through the identical eval
pipeline:

  A (oracle):   TRAIN_ATTEND_MODE=gather + first-by-index ball query +
                exact FPS — the reference-semantics training path
                (pcdet pointpillar_scatter.py:67-83 top-k gather; CUDA
                ball_query first-by-index; CUDA furthest_point_sample).
  B:            TRAIN_ATTEND_MODE=fused (ops/topk_attend bucket-threshold
                superset selection + masked-softmax matmuls).
  C:            BALL_QUERY=bucket (ops/pn2_select bucket-min selection via
                its exact XLA twin — kernel parity pinned by
                test_pn2_select.py::test_ball_query_xla_twin_matches_kernel).
  D:            FPS_CHUNKS=16 (Morton-chunked parallel FPS, the flagship
                train config's setting).

Gate: every variant's Car moderate 3D and BEV AP within 0.3 of the oracle —
the BASELINE.json AP tolerance.
"""

import numpy as np
import pytest

from tests.kitti_fixture import build_kitti_root
from tests.test_topk_ap_ab import (AP_KEY, BEV_KEY, _eval_ap,
                                   _small_hvpr_cfg, _train_overfit)


def _make_batches(cfg, root, n_scenes):
    from hvpr_tpu.datasets.kitti.kitti_dataset import KittiDataset
    train_ds = KittiDataset(cfg['DATA_CONFIG'], class_names=['Car'],
                            training=True, root_path=root)
    batch = train_ds.collate_batch([train_ds[i] for i in range(n_scenes)])
    batch.setdefault('grid_size', train_ds.grid_size)
    batch.setdefault('point_cloud_range', train_ds.point_cloud_range)
    batch.setdefault('voxel_size', train_ds.voxel_size)
    val_ds = KittiDataset(cfg['DATA_CONFIG'], class_names=['Car'],
                          training=False, root_path=root)
    val_batch = val_ds.collate_batch([val_ds[i] for i in range(n_scenes)])
    return batch, val_ds, val_batch


@pytest.mark.slow
def test_train_kernel_lowerings_ap_delta(tmp_path):
    import copy

    n_scenes = 4
    root, _ = build_kitti_root(tmp_path / 'kitti', n_scenes=n_scenes,
                               easy=True)
    ids = '\n'.join(f'{i:06d}' for i in range(n_scenes)) + '\n'
    (root / 'ImageSets' / 'train.txt').write_text(ids)
    (root / 'ImageSets' / 'val.txt').write_text(ids)

    base_cfg = _small_hvpr_cfg(root)
    from hvpr_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    create_kitti_infos(base_cfg['DATA_CONFIG'],
                       ['Car', 'Pedestrian', 'Cyclist'], root, root,
                       workers=2)

    variants = {
        'oracle': {'TRAIN_ATTEND_MODE': 'gather', 'BALL_QUERY': 'first',
                   'FPS_CHUNKS': 1},
        'fused_attend': {'TRAIN_ATTEND_MODE': 'fused', 'BALL_QUERY': 'first',
                         'FPS_CHUNKS': 1},
        'bucket_bq': {'TRAIN_ATTEND_MODE': 'gather', 'BALL_QUERY': 'bucket',
                      'FPS_CHUNKS': 1},
        'chunked_fps': {'TRAIN_ATTEND_MODE': 'gather', 'BALL_QUERY': 'first',
                        'FPS_CHUNKS': 16},
    }

    aps = {}
    for name, opts in variants.items():
        cfg = copy.deepcopy(base_cfg)
        cfg['MODEL']['MAP_TO_BEV']['TRAIN_ATTEND_MODE'] = \
            opts['TRAIN_ATTEND_MODE']
        cfg['MODEL']['BACKBONE_3D']['SA_CONFIG']['BALL_QUERY'] = \
            opts['BALL_QUERY']
        cfg['MODEL']['BACKBONE_3D']['SA_CONFIG']['FPS_CHUNKS'] = \
            opts['FPS_CHUNKS']
        # eval identically across variants: the exact top-k oracle mode
        # isolates the TRAIN-path difference under test
        cfg['MODEL']['MAP_TO_BEV']['TOPK_MODE'] = 'exact'

        batch, val_ds, val_batch = _make_batches(cfg, root, n_scenes)
        variables, ds_stub = _train_overfit(cfg, batch, n_steps=450)
        aps[name] = _eval_ap(cfg, 'exact', variables, ds_stub, val_ds,
                             val_batch)
    print('round-4 train-kernel AP A/B:', aps)

    # teeth: the oracle training actually detects
    assert aps['oracle'][BEV_KEY] > 10.0, aps
    assert aps['oracle'][AP_KEY] > 1.0, aps
    # BASELINE gate tolerance on both metrics, every variant vs the oracle
    for name in ('fused_attend', 'bucket_bq', 'chunked_fps'):
        for key in (AP_KEY, BEV_KEY):
            assert abs(aps[name][key] - aps['oracle'][key]) < 0.3, \
                (name, key, aps)
