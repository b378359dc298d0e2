#!/usr/bin/env python
"""Benchmark: HVPR inference throughput on one TPU chip.

Pipeline measured end-to-end on device (zero host round-trips per scan):
synthetic KITTI-like scans -> fixed-shape voxelization -> PillarVFE_Scale ->
memory-substituted scatter -> scale-aware BEV backbone -> anchor head ->
rotated NMS. Prints ONE JSON line with scans/sec.

Baseline: the reference publishes no numbers (BASELINE.md); the paper reports
~36 ms/scan (~28 scans/sec) on a single GPU, and the build target is >=2000
scans/sec on a v5e-8 (BASELINE.json), i.e. 250 scans/sec/chip.
vs_baseline is computed against 250 scans/sec/chip.

Timing note: block_until_ready does not block through the axon tunnel; we
chain N batches and force one device_get, subtracting the measured sync
latency (see .claude/skills/verify/SKILL.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from hvpr_tpu.config import cfg_from_yaml_file, ConfigDict
from hvpr_tpu.models import build_network
from hvpr_tpu.ops.voxelizer import voxelize_batch_flat

# serving batch: measured optimum on one v5e chip. Throughput is NOT
# monotonic in batch (round-3 sweep, scans/sec: b4 322, b8 359-383, b16 332,
# b24 291, b32 277): beyond b8 the flat-VFE channel-major pipeline falls off
# an XLA fusion regime (decorate+segment sweeps jump ~9x from b8 to b16 on
# identical code; docs/DESIGN.md round-3 notes), so larger batches lose more
# in the VFE than they amortize elsewhere.
BATCH = int(os.environ.get('BENCH_BATCH', '8'))
N_POINTS = 16384
MAX_VOXELS = 16000
BASELINE_SCANS_PER_SEC_PER_CHIP = 250.0


class _DatasetStub:
    def __init__(self, data_cfg, class_names):
        self.class_names = class_names
        pcr = np.asarray(data_cfg['POINT_CLOUD_RANGE'], dtype=np.float32)
        proc = {p['NAME']: p for p in data_cfg['DATA_PROCESSOR']}
        vs = np.asarray(proc['transform_points_to_voxels']['VOXEL_SIZE'], dtype=np.float32)
        self.point_cloud_range = pcr
        self.voxel_size = vs
        self.grid_size = np.round((pcr[3:6] - pcr[0:3]) / vs).astype(np.int64)


def synthetic_scans(rng, batch, n, pcr):
    pts = np.zeros((batch, n, 4), dtype=np.float32)
    pts[..., 0] = rng.uniform(pcr[0] + 0.1, pcr[3] - 0.1, (batch, n))
    pts[..., 1] = rng.uniform(pcr[1] + 0.1, pcr[4] - 0.1, (batch, n))
    pts[..., 2] = rng.uniform(pcr[2] + 0.1, pcr[5] - 0.1, (batch, n))
    pts[..., 3] = rng.uniform(0, 1, (batch, n))
    return pts


def realistic_scans(rng, batch, n, pcr):
    """KITTI-like occupancy (VERDICT r3 weak #3): real scans are heavily
    non-uniform — near-field ground density falls off ~1/r with range (a
    rotating scanner spreads a fixed ray budget over growing ring area),
    plus dense clusters on objects. Uses the same 7x7 jittered car-grid
    scene geometry as tests/kitti_fixture.py so the voxelizer sort, canvas
    scatter, and points-per-pillar cap see production-shaped load
    (near-range pillars saturate the 32-point cap; far pillars hold 1-2
    points) instead of uniform occupancy.
    """
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    'tests'))
    from kitti_fixture import make_scene

    pts = np.zeros((batch, n, 4), dtype=np.float32)
    n_obj_pts = 200
    for b in range(batch):
        boxes = make_scene(rng)                      # 49 cars, 7x7 grid
        clusters = []
        for box in boxes:
            local = rng.uniform(-0.4, 0.4, (n_obj_pts, 3)) * box[3:6]
            c, s = np.cos(box[6]), np.sin(box[6])
            world = np.stack([
                local[:, 0] * c - local[:, 1] * s + box[0],
                local[:, 0] * s + local[:, 1] * c + box[1],
                local[:, 2] + box[2],
            ], axis=1)
            clusters.append(world)
        obj = np.concatenate(clusters, axis=0)

        # ground/background with 1/r range density over the front FOV
        n_bg = n - len(obj)
        r_min, r_max = 2.0, float(pcr[3]) - 0.5
        u = rng.uniform(0, 1, n_bg)
        r = r_min * (r_max / r_min) ** u             # p(r) ∝ 1/r
        az = rng.uniform(-0.42, 0.42, n_bg)          # ±24° front cone
        bg = np.stack([r * np.cos(az), r * np.sin(az),
                       rng.normal(-1.6, 0.15, n_bg)], axis=1)
        xyz = np.concatenate([obj, bg], axis=0)[:n]
        xyz[:, 0] = np.clip(xyz[:, 0], pcr[0] + 0.1, pcr[3] - 0.1)
        xyz[:, 1] = np.clip(xyz[:, 1], pcr[1] + 0.1, pcr[4] - 0.1)
        xyz[:, 2] = np.clip(xyz[:, 2], pcr[2] + 0.1, pcr[5] - 0.1)
        pts[b, :, :3] = xyz
        pts[b, :, 3] = rng.uniform(0, 1, n)
    return pts


def main():
    # persistent compile cache (shared with the test suite): the bench
    # program is identical run-to-run, so repeat runs skip the multi-minute
    # flagship-pipeline compile
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'tests/.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    cfg = ConfigDict()
    cfg_from_yaml_file(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    'tools/cfgs/kitti_models/hvpr.yaml'), cfg)
    dataset = _DatasetStub(cfg['DATA_CONFIG'], cfg['CLASS_NAMES'])
    net = build_network(cfg['MODEL'], num_class=len(cfg['CLASS_NAMES']), dataset=dataset)

    pcr = tuple(float(v) for v in dataset.point_cloud_range)
    vsz = tuple(float(v) for v in dataset.voxel_size)
    grid = tuple(int(g) for g in dataset.grid_size)

    rng = np.random.default_rng(0)
    scans = jnp.asarray(realistic_scans(rng, BATCH, N_POINTS, pcr))
    uniform_scans = jnp.asarray(synthetic_scans(rng, BATCH, N_POINTS, pcr))
    pmask = jnp.ones((BATCH, N_POINTS), dtype=bool)

    def voxelize_batch(points, mask):
        return voxelize_batch_flat(
            points, mask, pcr, vsz, max_voxels=MAX_VOXELS,
            max_points_per_voxel=32, grid_size_static=grid)

    # init eval-path params with a tiny host batch
    vox = voxelize_batch(scans, pmask)
    init_batch = {'points': scans, 'point_valid_mask': pmask, **vox}
    net.init(jax.random.PRNGKey(0), init_batch, train=False)

    from hvpr_tpu.models.detectors.detector3d_template import post_processing

    @jax.jit
    def pipeline(variables, points, mask):
        v = voxelize_batch(points, mask)
        batch = {'points': points, 'point_valid_mask': mask, **v}
        out = net.module.apply(variables, batch, train=False)
        res = post_processing(out, cfg['MODEL']['POST_PROCESSING'],
                              len(cfg['CLASS_NAMES']))
        return res['pred_scores']

    # ONE compile, AOT: the compiled object serves the timing loops AND the
    # roofline cost analysis (a second .lower().compile() would recompile the
    # whole pipeline — minutes through the axon tunnel)
    compiled = pipeline.lower(net.variables, scans, pmask).compile()

    def pipeline_run(variables, points, mask):
        return compiled(variables, points, mask)

    # warm up and fully sync
    out = pipeline_run(net.variables, scans, pmask)
    _ = jax.device_get(out.ravel()[0])

    # roofline accounting (VERDICT r4 #2): XLA HLO cost analysis of the full
    # pipeline + the analytic top-up for the Pallas fused memory lookup
    # (custom calls report 0 flops there) — hvpr_tpu/utils/flops.py.
    from hvpr_tpu.utils import flops as flops_util
    xla_fl, xla_by = flops_util.xla_cost(compiled)
    vmask_h = np.asarray(jax.device_get(vox['voxel_mask']))
    need = int(max(1, (np.where(vmask_h)[1].max() + 1) if vmask_h.any() else 1))
    quarters = [max(1, (MAX_VOXELS * q) // 4) for q in (1, 2, 3, 4)]
    prefix = next(q for q in quarters if q >= need)
    mem_m = int(cfg['MODEL']['MAP_TO_BEV']['NUM_M'])
    mem_c = int(cfg['MODEL']['MAP_TO_BEV']['NUM_PT_FEATURES'])
    total_flops = xla_fl + flops_util.memory_lookup_fused_flops(
        BATCH * prefix, mem_m, mem_c)
    total_bytes = xla_by + 4.0 * (BATCH * prefix * mem_c * 2 + mem_m * mem_c)

    # median of N timed windows: single-window numbers spread ~6% run-to-run
    # on a shared host (round-2 saw 300-318 for identical code), so the
    # number of record is the median, with the window spread reported
    n_iter = int(os.environ.get('BENCH_ITERS', '20'))
    n_rep = int(os.environ.get('BENCH_REPEATS', '3'))

    def measure(points):
        rates = []
        for _ in range(n_rep):
            t0 = time.time()
            for _ in range(n_iter):
                out = pipeline_run(net.variables, points, pmask)
            _ = jax.device_get(out.ravel()[0])
            total = time.time() - t0
            t0 = time.time()
            _ = jax.device_get(out.ravel()[0])
            sync = time.time() - t0
            rates.append(BATCH / ((total - sync) / n_iter))
        return rates

    # number of record: KITTI-like (non-uniform) occupancy — the load the
    # reference's measured path (eval_utils.py:84-86) actually sees
    rates = measure(scans)
    uniform_rates = measure(uniform_scans)

    scans_per_sec = float(np.median(rates))
    batch_seconds = BATCH / scans_per_sec
    util = flops_util.utilization(total_flops, total_bytes, batch_seconds)
    print(json.dumps({
        'metric': 'hvpr_inference_scans_per_sec_per_chip',
        'value': round(scans_per_sec, 2),
        'unit': 'scans/sec',
        'vs_baseline': round(scans_per_sec / BASELINE_SCANS_PER_SEC_PER_CHIP, 3),
        'window_min': round(min(rates), 2),
        'window_max': round(max(rates), 2),
        'windows': n_rep,
        'scan_distribution': 'kitti_like',
        'uniform_scans_per_sec': round(float(np.median(uniform_rates)), 2),
        'gflop_per_batch': round(total_flops / 1e9, 1),
        'mfu': util['mfu'],
        'hbm_frac': util['hbm_frac'],
        'bound': util['bound'],
        'mfu_note': 'flops = XLA cost analysis + Pallas top-ups vs bf16 peak'
                    ' (hvpr_tpu/utils/flops.py); per-stage: STAGE_PROFILE.json',
    }))


if __name__ == '__main__':
    main()
