#!/usr/bin/env python
"""Cumulative stage profile of the HVPR inference pipeline on one TPU chip.

Times nested prefixes of the pipeline (voxelize -> VFE -> scatter/memory ->
backbone -> head -> post/NMS) with the axon-tunnel-safe protocol from
.claude/skills/verify/SKILL.md: chain N calls, device_get one scalar,
subtract the measured sync latency.

Each line also carries ROOFLINE accounting (VERDICT r4 #2): incremental
FLOPs (XLA HLO cost analysis + analytic Pallas top-ups, hvpr_tpu/utils/
flops.py), achieved MFU vs bf16 chip peak, HBM-bandwidth fraction, and the
dominant bound per stage. Writes STAGE_PROFILE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (shared with bench.py/tests): the stage-prefix
# programs are identical run-to-run and each costs minutes to compile cold
# through the axon remote-compile helper
jax.config.update('jax_compilation_cache_dir', os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'tests/.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from hvpr_tpu.config import cfg_from_yaml_file, ConfigDict
from hvpr_tpu.models import build_network
from hvpr_tpu.models.detectors.detector3d_template import post_processing
from hvpr_tpu.ops.voxelizer import voxelize_batch_flat
from hvpr_tpu.utils import flops as flops_util

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

    # analytic Pallas top-ups (XLA cost analysis reports custom calls as 0
    # flops): the eval path's only FLOP-carrying Pallas kernel is the fused
    # memory lookup inside map_to_bev; its row count depends on the
    # occupancy-adaptive quarter-prefix (memory_module.eval_forward).
    vox_host = jax.device_get(vox(scans, pmask))
    vmask_h = np.asarray(vox_host['voxel_mask'])
    need = int(max(1, (np.where(vmask_h)[1].max() + 1) if vmask_h.any() else 1))
    quarters = [max(1, (MAX_VOXELS * q) // 4) for q in (1, 2, 3, 4)]
    prefix = next(q for q in quarters if q >= need)
    mem_m = int(cfg['MODEL']['MAP_TO_BEV']['NUM_M'])
    mem_c = int(cfg['MODEL']['MAP_TO_BEV']['NUM_PT_FEATURES'])
    lookup_flops = flops_util.memory_lookup_fused_flops(
        BATCH * prefix, mem_m, mem_c)
    lookup_bytes = 4.0 * (BATCH * prefix * mem_c * 2 + mem_m * mem_c)
    pallas_topup = {'+map_to_bev': (lookup_flops, lookup_bytes)}

    n_iter = int(os.environ.get('BENCH_ITERS', '20'))
    stage_order = [s[0] for s in stages]
    rows = []
    prev_ms = prev_fl = prev_by = 0.0
    for name, fn in stages:
        jfn = jax.jit(fn)
        compiled = jfn.lower(scans, pmask).compile()
        xla_fl, xla_by = flops_util.xla_cost(compiled)
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

        # every pipeline prefix from a top-up's stage onward includes it
        pos = stage_order.index(name)
        topups = [v for s, v in pallas_topup.items()
                  if stage_order.index(s) <= pos]
        cum_fl = xla_fl + sum(f for f, _ in topups)
        cum_by = xla_by + sum(bb for _, bb in topups)
        inc_ms = ms - prev_ms
        inc_fl = cum_fl - prev_fl
        inc_by = cum_by - prev_by
        util = flops_util.utilization(inc_fl, inc_by, inc_ms / 1e3)
        cum_util = flops_util.utilization(cum_fl, cum_by, ms / 1e3)
        print(f'{name:<14} {ms:8.2f} ms/batch  {BATCH / (ms / 1e3):7.1f} scans/s'
              f'  | stage {inc_ms:7.2f} ms {inc_fl / 1e9:8.1f} GF'
              f'  mfu {util["mfu"]:6.1%}  hbm {util["hbm_frac"]:6.1%}'
              f'  [{util["bound"]}]', flush=True)
        rows.append({'stage': name, 'cum_ms': round(ms, 3),
                     'stage_ms': round(inc_ms, 3),
                     'stage_gflop': round(inc_fl / 1e9, 2),
                     'stage_gb': round(inc_by / 1e9, 3), **util,
                     'cum_mfu': cum_util['mfu']})
        prev_ms, prev_fl, prev_by = ms, cum_fl, cum_by

    peak_f, peak_b = flops_util.device_peaks()
    summary = {'batch': BATCH, 'stages': rows,
               'pipeline_ms': rows[-1]['cum_ms'],
               'scans_per_sec': round(BATCH / (rows[-1]['cum_ms'] / 1e3), 1),
               'pipeline_mfu': rows[-1]['cum_mfu'],
               'peak_tflops_bf16': peak_f / 1e12,
               'peak_hbm_gbps': peak_b / 1e9,
               'note': ('flops = XLA HLO cost analysis + analytic Pallas '
                        'top-ups (hvpr_tpu/utils/flops.py); mfu vs bf16 peak; '
                        'hbm_frac approximates fusion-internal traffic as '
                        'HBM traffic, so it overestimates')}
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'STAGE_PROFILE.json')
    with open(out_path, 'w') as f:
        json.dump(summary, f, indent=1)
    print(f'wrote {out_path}', flush=True)


if __name__ == '__main__':
    main()
