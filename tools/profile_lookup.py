#!/usr/bin/env python
"""Micro-bench of the fused eval memory lookup's three Pallas kernels.

Times each stage of ops/memory_lookup.memory_lookup_fused separately at
serving shapes (R = B*V rows, M=2000, C=64, k=20) to show where the eval
map_to_bev milliseconds go. Run on one TPU chip.
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'tests/.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from hvpr_tpu.ops import memory_lookup as ml

R = int(os.environ.get('LOOKUP_ROWS', str(16 * 16000)))
M, C, K = 2000, 64, 20
BLOCK, TBLOCK = 1024, 2048


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    pillars = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    memory = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))

    cp = ml._round_up(C, 128)
    mp = ml._round_up(M, 128)
    rp = ml._round_up(R, math.lcm(BLOCK, TBLOCK))
    pill_p = jnp.zeros((rp, cp), jnp.bfloat16).at[:R, :C].set(
        pillars.astype(jnp.bfloat16))
    mem_p = jnp.zeros((mp, cp), jnp.bfloat16).at[:M, :C].set(
        memory.astype(jnp.bfloat16))
    memT_p = mem_p.T
    col = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    bias = jnp.where(col < M, 0.0, ml._NEG).astype(jnp.float32)

    bmax_call = jax.jit(lambda p, mt, b: pl.pallas_call(
        ml._bmax_kernel,
        grid=(rp // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, ml._NUM_BUCKETS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, ml._NUM_BUCKETS), jnp.float32),
    )(p, mt, b))

    thresh_call = jax.jit(lambda bm: pl.pallas_call(
        functools.partial(ml._thresh_kernel, k=K),
        grid=(rp // TBLOCK,),
        in_specs=[pl.BlockSpec((TBLOCK, ml._NUM_BUCKETS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TBLOCK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, 128), jnp.float32),
    )(bm))

    apply_call = jax.jit(lambda p, mt, mm, b, th: pl.pallas_call(
        ml._apply_kernel,
        grid=(rp // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, cp), jnp.float32),
    )(p, mt, mm, b, th))

    bmax = bmax_call(pill_p, memT_p, bias)
    th = thresh_call(bmax)

    print(f'rows={R} (padded {rp})  M={M} C={C} k={K}', flush=True)
    print(f'A bmax (logits+max)   {timeit(bmax_call, pill_p, memT_p, bias):7.2f} ms', flush=True)
    print(f'B threshold loop      {timeit(thresh_call, bmax):7.2f} ms', flush=True)
    print(f'C apply (logits+sm)   {timeit(apply_call, pill_p, memT_p, mem_p, bias, th):7.2f} ms', flush=True)
    full = jax.jit(functools.partial(ml.memory_lookup_fused, k=K))
    print(f'full fused lookup     {timeit(full, pillars, memory):7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
