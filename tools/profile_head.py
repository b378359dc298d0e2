#!/usr/bin/env python
"""Micro-profile of the dense-head train stage (target assign + losses).

Isolates the `full - backbone_2d` delta of tools/profile_train_stages.py:
times (a) the target assigner alone, (b) head convs + losses fwd+bwd given
fixed BEV maps, (c) the optimizer update alone. Run on one TPU chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'tests/.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from hvpr_tpu.config import cfg_from_yaml_file, ConfigDict
from hvpr_tpu.models.dense_heads.anchor_head_single import AnchorHeadSingle

BATCH = int(os.environ.get('BENCH_BATCH', '4'))


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def main():
    cfg = ConfigDict()
    cfg_from_yaml_file(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tools/cfgs/kitti_models/hvpr.yaml'), cfg)
    mcfg = cfg['MODEL']['DENSE_HEAD']
    grid = (296, 248, 1)
    pcr = [0, -19.84, -2.5, 47.36, 19.84, 0.5]

    head = AnchorHeadSingle(
        model_cfg=mcfg, input_channels=384, num_class=1, class_names=['Car'],
        grid_size=grid, point_cloud_range=pcr)

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(BATCH, 124, 148, 384)).astype(np.float32))
    feat_pt = jnp.asarray(rng.normal(size=(BATCH, 124, 148, 384)).astype(np.float32))
    gt = np.zeros((BATCH, 8, 8), np.float32)
    gt[:, 0] = [20.0, -2.0, -1.0, 3.9, 1.6, 1.56, 0.1, 1]
    gt[:, 1] = [30.0, 3.0, -1.0, 3.9, 1.6, 1.56, -0.3, 1]
    gt = jnp.asarray(gt)

    batch = {'spatial_features_2d': feat, 'spatial_features_point_2d': feat_pt,
             'gt_boxes': gt}
    variables = head.init(jax.random.PRNGKey(0), batch, train=True)
    params = variables['params']

    bound = head.bind(variables)

    # (a) target assignment alone
    @jax.jit
    def assign(gt_boxes):
        return bound.target_assigner.assign_targets(bound.anchors_list, gt_boxes)
    print(f'assign_targets            {timeit(assign, gt):7.2f} ms', flush=True)

    # (b) full head train fwd+bwd wrt params AND both maps
    def loss_fn(p, f1, f2):
        out = head.apply({'params': p}, {**batch,
                                         'spatial_features_2d': f1,
                                         'spatial_features_point_2d': f2},
                         train=True)
        return out['loss']
    g = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
    print(f'head fwd+bwd (dual path)  {timeit(g, params, feat, feat_pt):7.2f} ms',
          flush=True)

    # (c) losses only: precompute preds, grad wrt preds
    @jax.jit
    def heads_only(p, f1, f2):
        def fwd(pp):
            out = head.apply({'params': pp}, {**batch,
                                              'spatial_features_2d': f1,
                                              'spatial_features_point_2d': f2},
                             train=True, method=lambda m, bd, train: (
                                 m._heads(bd['spatial_features_2d']),
                                 m._heads(bd['spatial_features_point_2d'])))
            return out
        return fwd(p)
    try:
        print(f'head convs only           {timeit(heads_only, params, feat, feat_pt):7.2f} ms',
              flush=True)
    except Exception as e:
        print('head convs only: skipped', type(e).__name__, flush=True)


if __name__ == '__main__':
    main()
