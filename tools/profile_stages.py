#!/usr/bin/env python
"""Cumulative stage profile of the HVPR inference pipeline on one TPU chip.

Times nested prefixes of the pipeline (voxelize -> VFE -> scatter/memory ->
backbone -> head -> post/NMS) with the axon-tunnel-safe protocol from
.claude/skills/verify/SKILL.md: chain N calls, device_get one scalar,
subtract the measured sync latency.
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
from hvpr_tpu.models.detectors.detector3d_template import post_processing
from hvpr_tpu.ops.voxelizer import voxelize_batch_flat

BATCH = int(os.environ.get('BENCH_BATCH', '16'))
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
    scans = jnp.asarray(pts)
    pmask = jnp.ones((BATCH, N_POINTS), bool)

    def vox(points, mask):
        return voxelize_batch_flat(points, mask, pcr, vsz, max_voxels=MAX_VOXELS,
                                   max_points_per_voxel=32, grid_size_static=grid)

    init_batch = {'points': scans, 'point_valid_mask': pmask, **vox(scans, pmask)}
    net.init(jax.random.PRNGKey(0), init_batch, train=False)
    variables = net.variables
    module = net.module

    def upto(stage):
        def fn(points, mask):
            v = vox(points, mask)
            if stage == 'voxelize':
                return v['flat_points']
            batch = {'points': points, 'point_valid_mask': mask, **v}
            out = module.apply(variables, batch, train=False, upto=stage)
            for key in ('batch_cls_preds', 'spatial_features_2d',
                        'spatial_features', 'pillar_features'):
                if key in out:
                    return out[key]
            return next(iter(out.values()))
        return fn

    def full(points, mask):
        v = vox(points, mask)
        batch = {'points': points, 'point_valid_mask': mask, **v}
        out = module.apply(variables, batch, train=False)
        res = post_processing(out, cfg['MODEL']['POST_PROCESSING'],
                              len(cfg['CLASS_NAMES']))
        return res['pred_scores']

    stages = [('voxelize', upto('voxelize')),
              ('+vfe', upto('vfe')),
              ('+map_to_bev', upto('map_to_bev')),
              ('+backbone_2d', upto('backbone_2d')),
              ('+dense_head', upto('dense_head')),
              ('full+post', full)]

    n_iter = int(os.environ.get('BENCH_ITERS', '20'))
    for name, fn in stages:
        jfn = jax.jit(fn)
        out = jfn(scans, pmask)
        _ = jax.device_get(out.ravel()[0])
        t0 = time.time()
        for _ in range(n_iter):
            out = jfn(scans, pmask)
        _ = jax.device_get(out.ravel()[0])
        total = time.time() - t0
        t0 = time.time()
        _ = jax.device_get(out.ravel()[0])
        sync = time.time() - t0
        ms = (total - sync) / n_iter * 1e3
        print(f'{name:<14} {ms:8.2f} ms/batch   '
              f'{BATCH / ((total - sync) / n_iter):7.1f} scans/s', flush=True)


if __name__ == '__main__':
    main()
