"""Parity: Pallas segmented sweeps vs the XLA twins in ops/scatter.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from hvpr_tpu.ops.scatter import segment_broadcast_max_t, segment_sums_t
from hvpr_tpu.ops.segment_sweep import segment_sweep_pallas


def _random_flat_layout(rng, r, max_seg, n_slots):
    """Random contiguous segments (<= max_seg rows) + sentinel gaps."""
    slot = np.full(r, n_slots, np.int32)   # sentinel
    write = np.zeros(r, bool)
    pos, sid = 0, 0
    while pos < r and sid < n_slots:
        gap = rng.integers(0, 3)
        pos += gap
        seg = rng.integers(1, max_seg + 1)
        end = min(pos + seg, r)
        slot[pos:end] = sid
        write[pos:end] = True
        pos = end
        sid += 1
    return slot, write


@pytest.mark.parametrize('op', ['max', 'sum'])
@pytest.mark.parametrize('r,c,block', [(512, 7, 128), (4096, 16, 1024),
                                       (1000, 3, 4096)])
def test_sweep_parity(op, r, c, block):
    rng = np.random.default_rng(r + c)
    slot, write = _random_flat_layout(rng, r, max_seg=32, n_slots=r // 4)
    x = rng.normal(size=(c, r)).astype(np.float32)
    if op == 'max':
        x = np.where(write[None, :], x, -1e9).astype(np.float32)
        ref = segment_broadcast_max_t(jnp.asarray(x), jnp.asarray(slot), 32)
    else:
        x = np.where(write[None, :], x, 0.0).astype(np.float32)
        ref = segment_sums_t(jnp.asarray(x), jnp.asarray(slot), 32)
    got = segment_sweep_pallas(jnp.asarray(x), jnp.asarray(slot), 32, op,
                               block=block, interpret=True)
    valid = write[None, :] & np.ones((c, 1), bool)
    np.testing.assert_allclose(np.asarray(got)[valid], np.asarray(ref)[valid],
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('op', ['max', 'sum'])
def test_sweep_parity_full_rows(op):
    """Dense layout (no gaps), segments exactly at block boundaries."""
    r, c, max_seg = 2048, 4, 32
    slot = np.repeat(np.arange(r // max_seg, dtype=np.int32), max_seg)
    x = np.random.default_rng(0).normal(size=(c, r)).astype(np.float32)
    if op == 'max':
        ref = segment_broadcast_max_t(jnp.asarray(x), jnp.asarray(slot), max_seg)
    else:
        ref = segment_sums_t(jnp.asarray(x), jnp.asarray(slot), max_seg)
    got = segment_sweep_pallas(jnp.asarray(x), jnp.asarray(slot), max_seg, op,
                               block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
