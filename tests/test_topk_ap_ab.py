"""AP-level A/B of the memory top-k lowering modes (VERDICT r2 #2).

Promotes tests/test_topk_ab.py's score-delta bound to the actual BASELINE
gate metric: train a small HVPR model to overfit two synthetic KITTI scenes,
then run the full eval pipeline (dataset -> eval forward -> NMS ->
generate_prediction_dicts -> official KITTI AP) once per
TOPK_MODE in {exact, fused, approx} with identical parameters, and assert
the Car 3D AP deltas stay inside the 0.3 tolerance of the BASELINE AP gate.

Reference semantics being approximated: exact top-k memory addressing,
pcdet/models/backbones_2d/map_to_bev/memory_module.py:62-74.
"""

import copy

import jax
import numpy as np
import pytest

from tests.kitti_fixture import build_kitti_root

AP_KEY = 'Car_3d/moderate_R40'
BEV_KEY = 'Car_bev/moderate_R40'


def _small_hvpr_cfg(root):
    from hvpr_tpu.config import ConfigDict, cfg_from_yaml_file
    cfg = ConfigDict()
    cfg_from_yaml_file('tools/cfgs/kitti_models/hvpr.yaml', cfg)
    dc = cfg['DATA_CONFIG']
    dc['DATA_PATH'] = str(root)
    # CPU-sized data pipeline: coarser pillars, fewer points/voxels, no
    # augmentation (static batch -> clean overfit)
    for proc in dc['DATA_PROCESSOR']:
        if proc['NAME'] == 'sample_points':
            proc['NUM_POINTS'] = {'train': 2048, 'test': 2048}
        if proc['NAME'] == 'transform_points_to_voxels':
            proc['VOXEL_SIZE'] = [0.32, 0.32, 3]
            proc['MAX_NUMBER_OF_VOXELS'] = {'train': 2000, 'test': 2000}
    dc['DATA_AUGMENTOR']['AUG_CONFIG_LIST'] = []

    m = cfg['MODEL']
    m['BACKBONE_3D']['SA_CONFIG']['NPOINTS'] = [256, 64]
    m['BACKBONE_3D']['SA_CONFIG']['NSAMPLE'] = [[8, 16], [8, 16], [8, 16]]
    m['BACKBONE_3D']['SA_CONFIG']['MLPS'] = [
        [[8, 8, 16], [8, 12, 16]], [[16, 16, 32], [16, 24, 32]]]
    m['BACKBONE_3D']['FP_MLPS'] = [[32, 32], [64, 64]]
    m['VFE']['NUM_FILTERS'] = [16, 32]
    m['VFE']['NUM_SCALE_FEATURES'] = [8, 16]
    m['MAP_TO_BEV'].update(NUM_BEV_FEATURES=64, NUM_PT_FEATURES=32,
                           NUM_SCALE_FEATURES=16, NUM_K=8, NUM_M=128)
    m['BACKBONE_2D'].update(
        LAYER_NUMS=[1, 1], SFM_LAYER_NUMS=[1, 1], LAYER_STRIDES=[2, 2],
        NUM_FILTERS=[32, 64], NUM_SCALE_FILTERS=[16, 32],
        UPSAMPLE_STRIDES=[1, 2], NUM_UPSAMPLE_FILTERS=[32, 32])
    pp = m['POST_PROCESSING']
    pp['SCORE_THRESH'] = 0.02
    pp['NMS_CONFIG'].update(NMS_PRE_MAXSIZE=512, NMS_POST_MAXSIZE=128)
    return cfg


def _train_overfit(cfg, batch, n_steps):
    from hvpr_tpu.models import build_network
    from hvpr_tpu.optimization import build_optimizer
    from hvpr_tpu.parallel import TrainState, make_train_step

    class _DS:
        class_names = ['Car']

    _DS.grid_size = batch.pop('grid_size')
    _DS.point_cloud_range = batch.pop('point_cloud_range')
    _DS.voxel_size = batch.pop('voxel_size')

    net = build_network(cfg['MODEL'], num_class=1, dataset=_DS())
    device_batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    variables = net.init(jax.random.PRNGKey(0), device_batch, train=True)
    optim_cfg = {'OPTIMIZER': 'adam_onecycle', 'LR': 3e-3, 'WEIGHT_DECAY': 0.0,
                 'MOMS': [0.95, 0.85], 'PCT_START': 0.4, 'DIV_FACTOR': 10,
                 'GRAD_NORM_CLIP': 10}
    tx, _ = build_optimizer(variables['params'], optim_cfg, total_steps=n_steps)
    step = make_train_step(net.module, tx, mesh=None, donate=False)
    state = TrainState.create(variables, tx)
    for _ in range(n_steps):
        state, metrics = step(state, device_batch)
    assert np.isfinite(float(metrics['loss']))
    return {'params': state.params, 'batch_stats': state.batch_stats}, _DS


def _eval_ap(cfg, mode, variables, ds_stub, val_ds, val_batch, bf16=False):
    from hvpr_tpu.models import build_network
    from hvpr_tpu.models.detectors.detector3d_template import post_processing

    model_cfg = copy.deepcopy(cfg['MODEL'])
    model_cfg['MAP_TO_BEV']['TOPK_MODE'] = mode
    if bf16:
        model_cfg['MAP_TO_BEV']['CANVAS_DTYPE'] = 'bf16'
        model_cfg['BACKBONE_2D']['COMPUTE_DTYPE'] = 'bf16'
    net = build_network(model_cfg, num_class=1, dataset=ds_stub())
    device_batch = {k: v for k, v in val_batch.items()
                    if isinstance(v, np.ndarray) and k != 'gt_boxes'}
    out = net.module.apply(variables, device_batch, train=False)
    res = post_processing(out, model_cfg['POST_PROCESSING'], num_class=1)
    boxes, scores, labels = (np.asarray(res[k]) for k in
                             ('pred_boxes', 'pred_scores', 'pred_labels'))
    mask = np.asarray(res['pred_mask'])
    pred_dicts = [{'pred_boxes': boxes[b][mask[b]],
                   'pred_scores': scores[b][mask[b]],
                   'pred_labels': labels[b][mask[b]]}
                  for b in range(boxes.shape[0])]
    annos = val_ds.generate_prediction_dicts(val_batch, pred_dicts, ['Car'])
    _, result = val_ds.evaluation(annos, ['Car'])
    return {k: result[k] for k in (AP_KEY, BEV_KEY)}


@pytest.mark.slow
def test_topk_modes_ap_delta(tmp_path):
    # 4 scenes x 49 cars = 196 gts keep the per-detection R40 AP quantum
    # well under the 0.3 gate, and the EASY fixture (anchor-matched sizes,
    # fixed z, near-axis headings) lets 450 overfit steps reach sharp
    # 3D@0.7 localization — with the hard fixture most boxes sit at
    # marginal IoU and the bf16 rounding-placement difference between
    # lowering modes flips enough of them to swamp the gate (~0.4 AP of
    # pure noise, measured)
    n_scenes = 4
    root, _ = build_kitti_root(tmp_path / 'kitti', n_scenes=n_scenes, easy=True)
    ids = '\n'.join(f'{i:06d}' for i in range(n_scenes)) + '\n'
    # overfit the very scenes we evaluate: train split == val split
    (root / 'ImageSets' / 'train.txt').write_text(ids)
    (root / 'ImageSets' / 'val.txt').write_text(ids)

    cfg = _small_hvpr_cfg(root)
    from hvpr_tpu.datasets.kitti.kitti_dataset import KittiDataset, create_kitti_infos
    create_kitti_infos(cfg['DATA_CONFIG'], ['Car', 'Pedestrian', 'Cyclist'],
                       root, root, workers=2)

    train_ds = KittiDataset(cfg['DATA_CONFIG'], class_names=['Car'],
                            training=True, root_path=root)
    batch = train_ds.collate_batch([train_ds[i] for i in range(n_scenes)])
    batch.setdefault('grid_size', train_ds.grid_size)
    batch.setdefault('point_cloud_range', train_ds.point_cloud_range)
    batch.setdefault('voxel_size', train_ds.voxel_size)
    variables, ds_stub = _train_overfit(cfg, batch, n_steps=450)

    val_ds = KittiDataset(cfg['DATA_CONFIG'], class_names=['Car'],
                          training=False, root_path=root)
    val_batch = val_ds.collate_batch([val_ds[i] for i in range(n_scenes)])

    aps = {mode: _eval_ap(cfg, mode, variables, ds_stub, val_ds, val_batch)
           for mode in ('exact', 'fused', 'approx')}
    aps['fused_bf16'] = _eval_ap(cfg, 'fused', variables, ds_stub, val_ds,
                                 val_batch, bf16=True)
    print('topk AP A/B:', aps)

    # the comparison must have teeth: the overfit model actually detects
    # (BEV AP is the localization-forgiving axis; 3D@0.7 stays low for a
    # few-hundred-step overfit, which is fine for a *delta* bound)
    assert aps['exact'][BEV_KEY] > 10.0, aps
    assert aps['exact'][AP_KEY] > 1.0, aps
    # BASELINE gate tolerance (Car moderate AP within 0.3), on both metrics
    for key in (AP_KEY, BEV_KEY):
        assert abs(aps['fused'][key] - aps['exact'][key]) < 0.3, aps
        assert abs(aps['approx'][key] - aps['exact'][key]) < 0.3, aps
        # the serving bf16 canvas + conv pyramid stays inside the gate
        assert abs(aps['fused_bf16'][key] - aps['exact'][key]) < 0.3, aps
