#!/usr/bin/env python
"""Cumulative stage profile of the HVPR TRAIN step (fwd+bwd) on one TPU chip.

For each pipeline prefix, times value_and_grad of a surrogate loss (sum of
the prefix's output tensor) wrt the parameters — so each line is the
forward+backward cost of everything up to and including that stage. The last
line is the real train step (head loss + optimizer update). Timing uses the
axon-tunnel-safe protocol from .claude/skills/verify/SKILL.md.

Training stage order (MixAnchorMemory): backbone_3d (point stream, training
only) -> vfe -> map_to_bev (memory reconstruction) -> backbone_2d ->
dense_head loss.
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

_STAGE_OUT = ('batch_cls_preds', 'spatial_features_2d', 'spatial_features',
              'pillar_features', 'point_features')


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
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}

    def surrogate(stage):
        def loss_fn(p):
            out, _ = net.module.apply(
                {'params': p, **rest}, batch, train=True, upto=stage,
                mutable=['batch_stats'])
            for key in _STAGE_OUT:
                if key in out and out[key] is not None:
                    return jnp.sum(out[key].astype(jnp.float32))
            raise KeyError(f'no stage output after {stage}: {list(out)}')
        return loss_fn

    def time_fn(jfn, *args):
        out = jfn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = jax.device_get(leaf.ravel()[0])
        n_iter = int(os.environ.get('BENCH_ITERS', '8'))
        t0 = time.time()
        for _ in range(n_iter):
            out = jfn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = jax.device_get(leaf.ravel()[0])
        total = time.time() - t0
        t0 = time.time()
        _ = jax.device_get(leaf.ravel()[0])
        sync = time.time() - t0
        return (total - sync) / n_iter * 1e3

    for stage in ('backbone_3d', 'vfe', 'map_to_bev', 'backbone_2d'):
        jfn = jax.jit(jax.grad(surrogate(stage)))
        ms = time_fn(jfn, params)
        print(f'grad upto {stage:<12} {ms:8.1f} ms/step (batch {BATCH})',
              flush=True)

    tx, _ = build_optimizer(params, cfg['OPTIMIZATION'],
                            total_steps=1000, total_iters_each_epoch=100)
    state = TrainState.create(variables, tx)
    step = make_train_step(net.module, tx, mesh=make_mesh(), donate=False)
    jstep = lambda: step(state, batch)
    out = step(state, batch)
    _ = jax.device_get(out[1]['loss'])
    n_iter = int(os.environ.get('BENCH_ITERS', '8'))
    t0 = time.time()
    for _ in range(n_iter):
        s2, metrics = step(state, batch)
    _ = jax.device_get(metrics['loss'])
    total = time.time() - t0
    t0 = time.time()
    _ = jax.device_get(metrics['loss'])
    sync = time.time() - t0
    print(f'full train step       {(total - sync) / n_iter * 1e3:8.1f} ms/step '
          f'(batch {BATCH})', flush=True)


if __name__ == '__main__':
    main()
