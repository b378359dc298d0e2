#!/usr/bin/env python
"""Time the full HVPR train step (fwd+bwd+optimizer) on one TPU chip.

Axon-tunnel-safe timing (see .claude/skills/verify/SKILL.md): chain N steps,
device_get one scalar, subtract sync latency.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hvpr_tpu.config import cfg_from_yaml_file, ConfigDict
from hvpr_tpu.models import build_network
from hvpr_tpu.optimization import build_optimizer
from hvpr_tpu.parallel import TrainState, make_mesh, make_train_step
from hvpr_tpu.ops.voxelizer import voxelize_batch_flat

BATCH = int(os.environ.get('BENCH_BATCH', '4'))
N_POINTS = 16384
MAX_VOXELS = 16000


def main():
    cfg = ConfigDict()
    cfg_from_yaml_file(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tools/cfgs/kitti_models/hvpr.yaml'), cfg)

    pcr = tuple(float(v) for v in cfg['DATA_CONFIG']['POINT_CLOUD_RANGE'])
    proc = {p['NAME']: p for p in cfg['DATA_CONFIG']['DATA_PROCESSOR']}
    vsz = tuple(float(v) for v in proc['transform_points_to_voxels']['VOXEL_SIZE'])
    grid = tuple(int(round((pcr[3 + i] - pcr[i]) / vsz[i])) for i in range(3))

    class DS:
        class_names = cfg['CLASS_NAMES']
        point_cloud_range = np.asarray(pcr, np.float32)
        voxel_size = np.asarray(vsz, np.float32)
        grid_size = np.asarray(grid, np.int64)

    net = build_network(cfg['MODEL'], num_class=1, dataset=DS)

    rng = np.random.default_rng(0)
    pts = np.zeros((BATCH, N_POINTS, 4), np.float32)
    pts[..., 0] = rng.uniform(pcr[0] + .1, pcr[3] - .1, (BATCH, N_POINTS))
    pts[..., 1] = rng.uniform(pcr[1] + .1, pcr[4] - .1, (BATCH, N_POINTS))
    pts[..., 2] = rng.uniform(pcr[2] + .1, pcr[5] - .1, (BATCH, N_POINTS))
    pts[..., 3] = rng.uniform(0, 1, (BATCH, N_POINTS))
    gt = np.zeros((BATCH, 8, 8), np.float32)
    gt[:, 0] = [20.0, -2.0, -1.0, 3.9, 1.6, 1.56, 0.1, 1]
    gt[:, 1] = [30.0, 3.0, -1.0, 3.9, 1.6, 1.56, -0.3, 1]

    scans = jnp.asarray(pts)
    pmask = jnp.ones((BATCH, N_POINTS), bool)
    vox = voxelize_batch_flat(scans, pmask, pcr, vsz, max_voxels=MAX_VOXELS,
                              max_points_per_voxel=32, grid_size_static=grid)
    batch = {'points': scans, 'point_valid_mask': pmask,
             'gt_boxes': jnp.asarray(gt), **vox}

    variables = net.init(jax.random.PRNGKey(0), batch, train=True)
    tx, lr_fn = build_optimizer(variables['params'], cfg['OPTIMIZATION'],
                                total_steps=1000, total_iters_each_epoch=100)
    state = TrainState.create(variables, tx)
    mesh = make_mesh()
    step = make_train_step(net.module, tx, mesh=mesh)

    state, metrics = step(state, batch)
    _ = jax.device_get(metrics['loss'])

    n_iter = int(os.environ.get('BENCH_ITERS', '8'))
    t0 = time.time()
    for _ in range(n_iter):
        state, metrics = step(state, batch)
    loss = metrics['loss']
    _ = jax.device_get(loss)
    total = time.time() - t0
    t0 = time.time()
    _ = jax.device_get(loss)
    sync = time.time() - t0

    per_step = (total - sync) / n_iter
    # one JSON line so training speed is a recorded artifact (VERDICT r2 #5)
    import json
    print(json.dumps({
        'metric': 'hvpr_train_step_ms',
        'value': round(per_step * 1e3, 1),
        'unit': 'ms/step',
        'batch': BATCH,
        'scans_per_sec': round(BATCH / per_step, 1),
    }))


if __name__ == '__main__':
    main()
