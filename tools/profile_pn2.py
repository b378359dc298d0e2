"""Micro-profile of the PointNet++ point-stream backbone at flagship shapes.

Times each primitive (FPS, ball query, grouping, shared MLP, 3-NN FP) and
the whole backbone, forward and forward+backward, on the current default
backend. Used to target train-step optimization (the point stream runs only
in training — reference detectors/pointpillar.py:54-55)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compile cache — see tools/profile_stages.py
jax.config.update('jax_compilation_cache_dir', os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'tests/.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np

from hvpr_tpu.models.backbones_3d.pointnet2_backbone import PointNet2MSG
from hvpr_tpu.ops import pointnet2 as pn2

B, N = 4, 16384
SA_CFG = {
    'NPOINTS': [4096, 1024],
    'FPS_CHUNKS': 16,
    'RADIUS': [[0.1, 0.5], [0.5, 1.0]],
    'NSAMPLE': [[16, 32], [16, 32]],
    'MLPS': [[[16, 16, 32], [16, 24, 32]], [[32, 32, 64], [32, 48, 64]]],
}
MODEL_CFG = {'SA_CONFIG': SA_CFG, 'FP_MLPS': [[64, 64], [128, 128]]}


def _sync(out):
    # block_until_ready does NOT block on the axon tunnel — fetch a scalar
    # (protocol from .claude/skills/verify/SKILL.md)
    leaf = jax.tree_util.tree_leaves(out)[0]
    return jax.device_get(leaf.ravel()[0])


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    _sync(out)
    sync = time.perf_counter() - t0
    ms = (total - sync) / iters * 1e3
    print(f'{name:<42} {ms:8.2f} ms', flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(scale=15.0, size=(B, N, 4)).astype(np.float32))
    xyz = pts[..., :3]
    mask = jnp.asarray(rng.random((B, N)) < 0.97)

    fps = jax.jit(lambda x, m: pn2.furthest_point_sample(x, m, 4096,
                                                         num_chunks=16))
    timeit('fps 16384->4096 (16 chunks)', fps, xyz, mask)

    idx = fps(xyz, mask)
    new_xyz = pn2.group_points(xyz, idx)
    for r, ns in ((0.1, 16), (0.5, 32)):
        bq = jax.jit(lambda x, nx, m, r=r, ns=ns: pn2.ball_query(r, ns, x, nx, m))
        timeit(f'ball_query r={r} ns={ns} (16384->4096)', bq, xyz, new_xyz, mask)

    nbr, cnt = pn2.ball_query(0.5, 32, xyz, new_xyz, mask)
    feats = jnp.asarray(rng.normal(size=(B, N, 32)).astype(np.float32))
    gp = jax.jit(lambda f, i: pn2.group_points(f, i.reshape(B, -1)))
    timeit('group_points (4096x32, C=32)', gp, feats, nbr)

    tnn = jax.jit(lambda u, k, m: pn2.three_nn(u, k, m))
    kxyz = new_xyz
    kmask = jnp.take_along_axis(mask, idx, axis=1)
    timeit('three_nn (16384 from 4096)', tnn, xyz, kxyz, kmask)

    # full backbone fwd and fwd+bwd
    net = PointNet2MSG(model_cfg=MODEL_CFG, input_channels=4)
    batch = {'points': pts, 'point_valid_mask': mask}
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=True)
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}

    fwd = jax.jit(lambda p, b: net.apply({'params': p, **rest}, dict(b),
                                         train=True,
                                         mutable=['batch_stats'])[0][
                                             'point_features'].sum())
    timeit('backbone fwd', fwd, params, batch, iters=10)

    grad = jax.jit(jax.grad(lambda p, b: net.apply(
        {'params': p, **rest}, dict(b), train=True,
        mutable=['batch_stats'])[0]['point_features'].sum()))
    timeit('backbone fwd+bwd', grad, params, batch, iters=10)


if __name__ == '__main__':
    main()
