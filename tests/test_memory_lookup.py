"""Fused memory lookup: oracle + A/B-vs-exact-top-k tests.

Covers VERDICT round-1 weak item 2 (unquantified approximate top-k): the
fused kernel's selected set is a SUPERSET of the exact top-k, and the
aggregated output must match the exact-lax.top_k reference closely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvpr_tpu.ops.memory_lookup import memory_lookup_fused, _NUM_BUCKETS


def exact_reference(pillars, memory, k):
    """Reference semantics: softmax over the exact top-k logits @ memory."""
    logits = pillars @ memory.T                        # (R, M)
    vals, idx = jax.lax.top_k(jnp.asarray(logits), k)
    vals = np.asarray(vals)
    idx = np.asarray(idx)
    w = np.exp(vals - vals.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum('rk,rkc->rc', w, memory[idx])


def numpy_superset_reference(pillars, memory, k):
    """Numpy emulation of the bucket-threshold semantics (bf16 matmuls)."""
    p = pillars.astype(np.float32)
    logits = (p.astype(jnp.bfloat16).astype(np.float32)
              @ memory.astype(jnp.bfloat16).astype(np.float32).T)
    r, m = logits.shape
    mp = (m + _NUM_BUCKETS - 1) // _NUM_BUCKETS * _NUM_BUCKETS
    lp = np.full((r, mp), -1e30, np.float32)
    lp[:, :m] = logits
    bmax = lp.reshape(r, mp // _NUM_BUCKETS, _NUM_BUCKETS).max(axis=1)
    thresh = np.sort(bmax, axis=-1)[:, -k][:, None]
    sel = lp >= thresh
    mx = lp.max(-1, keepdims=True)
    e = np.where(sel, np.exp(lp - mx), 0.0)
    w = e / e.sum(-1, keepdims=True)
    return (w[:, :m].astype(jnp.bfloat16).astype(np.float32)
            @ memory.astype(jnp.bfloat16).astype(np.float32))


@pytest.fixture(scope='module')
def data():
    rng = np.random.default_rng(7)
    r, c, m = 300, 64, 500   # deliberately unaligned row/memory counts
    pillars = rng.normal(size=(r, c)).astype(np.float32)
    memory = (rng.uniform(-1, 1, size=(m, c)) / np.sqrt(c)).astype(np.float32)
    return pillars, memory


def test_matches_numpy_superset_semantics(data):
    pillars, memory = data
    out = np.asarray(memory_lookup_fused(jnp.asarray(pillars),
                                         jnp.asarray(memory), k=20))
    ref = numpy_superset_reference(pillars, memory, k=20)
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=1e-3)


def test_pallas_interpret_matches_emulation(data):
    pillars, memory = data
    xla = np.asarray(memory_lookup_fused(jnp.asarray(pillars),
                                         jnp.asarray(memory), k=20))
    pal = np.asarray(memory_lookup_fused(jnp.asarray(pillars),
                                         jnp.asarray(memory), k=20,
                                         interpret=True))
    np.testing.assert_allclose(pal, xla, rtol=0.02, atol=1e-4)


def test_close_to_exact_topk(data):
    """A/B: fused superset aggregation vs exact f32 top-k aggregation.

    The superset only adds near-threshold items with small softmax mass; its
    error contribution must stay within ~2x of what bf16 matmul rounding
    ALONE introduces (the fused kernel's matmuls are bf16-in/f32-acc).
    """
    pillars, memory = data
    out = np.asarray(memory_lookup_fused(jnp.asarray(pillars),
                                         jnp.asarray(memory), k=20))
    ref = exact_reference(pillars, memory, k=20)

    # exact top-k computed on bf16 logits: isolates the bf16 rounding floor
    lb = (pillars.astype(jnp.bfloat16).astype(np.float32)
          @ memory.astype(jnp.bfloat16).astype(np.float32).T)
    vb = np.sort(lb, -1)[:, ::-1][:, :20]
    ib = np.argsort(-lb, -1)[:, :20]
    wb = np.exp(vb - vb[:, :1])
    wb /= wb.sum(-1, keepdims=True)
    ref_bf16 = np.einsum('rk,rkc->rc', wb, memory[ib])
    bf16_floor = np.abs(ref_bf16 - ref).max()

    err = np.abs(out - ref).max()
    assert err <= 2.0 * bf16_floor + 1e-3, (err, bf16_floor)


def test_superset_threshold_bound(data):
    """The bucket threshold never exceeds the true k-th largest logit."""
    pillars, memory = data
    k = 20
    logits = pillars @ memory.T
    r, m = logits.shape
    mp = (m + _NUM_BUCKETS - 1) // _NUM_BUCKETS * _NUM_BUCKETS
    lp = np.full((r, mp), -1e30, np.float32)
    lp[:, :m] = logits
    bmax = lp.reshape(r, mp // _NUM_BUCKETS, _NUM_BUCKETS).max(axis=1)
    thresh = np.sort(bmax, axis=-1)[:, -k]
    kth_largest = np.sort(logits, axis=-1)[:, -k]
    assert np.all(thresh <= kth_largest + 1e-6)
    # and the selected count stays close to k
    counts = (logits >= thresh[:, None]).sum(-1)
    assert counts.min() >= k
    assert counts.mean() <= 3 * k, counts.mean()


def test_degenerate_all_zero_rows():
    """Padding rows (all-zero pillars) must not produce NaNs."""
    memory = np.random.default_rng(0).uniform(-1, 1, (256, 64)).astype(np.float32)
    pillars = np.zeros((8, 64), np.float32)
    out = np.asarray(memory_lookup_fused(jnp.asarray(pillars),
                                         jnp.asarray(memory), k=20))
    assert np.all(np.isfinite(out))


def test_eval_forward_prefix_switch_parity():
    """MemoryUnitAgg.eval_forward with vmask: the quarter-prefix lax.switch
    must reproduce the full-length run on every VALID row (invalid rows are
    canvas-discarded downstream), for both compacted and scattered masks."""
    from hvpr_tpu.models.backbones_2d.map_to_bev.memory_module import (
        MemoryUnitAgg,
    )
    rng = np.random.default_rng(0)
    b, v, c, k = 2, 1024, 16, 5
    pillars = jnp.asarray(rng.normal(size=(b, v, c)).astype(np.float32))
    mod = MemoryUnitAgg(mem_dim=64, fea_dim=c, shrink_thres=0.0025)
    vars_ = mod.init(jax.random.PRNGKey(0), pillars, k)

    full = mod.apply(vars_, pillars, k, method=mod.eval_forward)['output']

    # compacted mask (voxelizer invariant): valid prefix of 300 rows
    m1 = np.zeros((b, v), bool)
    m1[:, :300] = True
    out1 = mod.apply(vars_, pillars, k, 'fused', jnp.asarray(m1),
                     method=mod.eval_forward)['output']
    np.testing.assert_allclose(np.asarray(out1)[:, :300],
                               np.asarray(full)[:, :300], rtol=1e-6, atol=1e-6)
    # the chosen prefix is the next quarter boundary (512 for 300/1024);
    # rows beyond it are exactly zero
    assert (np.asarray(out1)[:, 512:] == 0).all()

    # scattered mask: a valid row deep in the array forces a longer prefix
    m2 = np.zeros((b, v), bool)
    m2[:, :100] = True
    m2[0, 900] = True
    out2 = mod.apply(vars_, pillars, k, 'fused', jnp.asarray(m2),
                     method=mod.eval_forward)['output']
    got = np.asarray(out2)
    want = np.asarray(full)
    np.testing.assert_allclose(got[:, :100], want[:, :100], rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(got[0, 900], want[0, 900], rtol=1e-6,
                               atol=1e-6)
