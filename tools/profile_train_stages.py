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

Each line carries ROOFLINE accounting (VERDICT r4 #2): incremental FLOPs
(XLA HLO cost analysis + analytic Pallas top-ups for the train-path fused
kernels — bucket_threshold, 2x masked_attend, memory_recon), MFU vs bf16
peak, HBM fraction, dominant bound. Writes TRAIN_PROFILE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache — see tools/profile_stages.py
jax.config.update('jax_compilation_cache_dir', os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'tests/.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from hvpr_tpu.config import cfg_from_yaml_file, ConfigDict
from hvpr_tpu.models import build_network
from hvpr_tpu.optimization import build_optimizer
from hvpr_tpu.parallel import TrainState, make_mesh, make_train_step
from hvpr_tpu.ops.voxelizer import voxelize_batch_flat
from hvpr_tpu.utils import flops as flops_util

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

    # analytic Pallas top-ups per prefix (fwd+bwd; hvpr_tpu/utils/flops.py).
    # The train path's FLOP-carrying Pallas kernels all live in map_to_bev:
    # bucket_threshold + masked_attend(shared) for the point pooling, and
    # memory_recon + masked_attend(split) for the memory aggregation
    # (pointpillar_scatter.py train branch, TRAIN_ATTEND_MODE=fused).
    mb_cfg = cfg['MODEL']['MAP_TO_BEV']
    mem_m = int(mb_cfg['NUM_M'])
    c_pt = int(mb_cfg['NUM_PT_FEATURES'])
    map_to_bev_topup = (
        flops_util.bucket_threshold_flops(BATCH, MAX_VOXELS, N_POINTS, c_pt)
        + flops_util.masked_attend_flops(BATCH, MAX_VOXELS, N_POINTS, c_pt,
                                         shared=True, with_bwd=True)
        + flops_util.memory_recon_flops(BATCH * N_POINTS, mem_m, c_pt,
                                        with_bwd=True)
        + flops_util.masked_attend_flops(BATCH, MAX_VOXELS, N_POINTS, c_pt,
                                         shared=False, with_bwd=True))
    topup_from = {'backbone_3d': 0.0, 'vfe': 0.0,
                  'map_to_bev': map_to_bev_topup,
                  'backbone_2d': map_to_bev_topup,
                  'full': map_to_bev_topup}

    rows = []
    prev_ms = prev_fl = prev_by = 0.0

    def record(stage, ms, xla_fl, xla_by):
        nonlocal prev_ms, prev_fl, prev_by
        cum_fl = xla_fl + topup_from[stage]
        cum_by = xla_by
        inc_ms, inc_fl, inc_by = ms - prev_ms, cum_fl - prev_fl, cum_by - prev_by
        util = flops_util.utilization(inc_fl, inc_by, inc_ms / 1e3)
        print(f'grad upto {stage:<12} {ms:8.1f} ms/step (batch {BATCH})'
              f'  | stage {inc_ms:7.1f} ms {inc_fl / 1e9:8.1f} GF'
              f'  mfu {util["mfu"]:6.1%}  hbm {util["hbm_frac"]:6.1%}'
              f'  [{util["bound"]}]', flush=True)
        rows.append({'stage': stage, 'cum_ms': round(ms, 1),
                     'stage_ms': round(inc_ms, 1),
                     'stage_gflop': round(inc_fl / 1e9, 1), **util})
        prev_ms, prev_fl, prev_by = ms, cum_fl, cum_by

    for stage in ('backbone_3d', 'vfe', 'map_to_bev', 'backbone_2d'):
        jfn = jax.jit(jax.grad(surrogate(stage)))
        compiled = jfn.lower(params).compile()
        xla_fl, xla_by = flops_util.xla_cost(compiled)
        ms = time_fn(jfn, params)
        record(stage, ms, xla_fl, xla_by)

    tx, _ = build_optimizer(params, cfg['OPTIMIZATION'],
                            total_steps=1000, total_iters_each_epoch=100)
    state = TrainState.create(variables, tx)
    step = make_train_step(net.module, tx, mesh=make_mesh(), donate=False)
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
    full_ms = (total - sync) / n_iter * 1e3
    try:
        full_fl, full_by = flops_util.xla_cost(
            jax.jit(step).lower(state, batch).compile())
    except Exception:
        # make_train_step returns an already-jitted callable; re-jitting a
        # jitted fn is fine in jax, but fall back to the last prefix if not
        full_fl, full_by = prev_fl - topup_from['backbone_2d'], prev_by
    record('full', full_ms, full_fl, full_by)

    peak_f, peak_b = flops_util.device_peaks()
    summary = {
        'metric': 'hvpr_train_step_ms', 'value': round(full_ms, 1),
        'unit': 'ms/step', 'batch': BATCH,
        'scans_per_sec': round(BATCH / (full_ms / 1e3), 1),
        'train_step_mfu': rows[-1]['mfu'] if rows[-1]['stage'] == 'full'
                          else None,
        'stages': rows,
        'peak_tflops_bf16': peak_f / 1e12,
        'peak_hbm_gbps': peak_b / 1e9,
        'note': ('tools/profile_train_stages.py on one v5e chip; flops = XLA '
                 'HLO cost analysis + analytic Pallas top-ups '
                 '(hvpr_tpu/utils/flops.py); mfu vs bf16 peak; full-step mfu '
                 'uses the whole train-step graph incl. optimizer'),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'TRAIN_PROFILE.json')
    with open(out_path, 'w') as f:
        json.dump(summary, f, indent=1)
    print(f'full train step       {full_ms:8.1f} ms/step (batch {BATCH})  '
          f'-> wrote {out_path}', flush=True)


if __name__ == '__main__':
    main()
