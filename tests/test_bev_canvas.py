"""Pallas sorted-cell canvas builder vs the generic scatter (exact parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hvpr_tpu.ops.bev_canvas import canvas_from_sorted
from hvpr_tpu.ops.scatter import scatter_to_bev

NY, NX = 24, 40


def _sorted_inputs(rng, b, v, c, n_valid):
    feat = rng.normal(size=(b, v, c)).astype(np.float32) * 10
    coords = np.zeros((b, v, 3), np.int32)
    mask = np.zeros((b, v), bool)
    for i in range(b):
        nv = n_valid[i]
        cells = np.sort(rng.choice(NY * NX, nv, replace=False))
        coords[i, :nv, 1] = cells // NX
        coords[i, :nv, 2] = cells % NX
        mask[i, :nv] = True
    return jnp.asarray(feat), jnp.asarray(coords), jnp.asarray(mask)


@pytest.mark.parametrize('c', [16, 160])
def test_canvas_matches_scatter(c):
    rng = np.random.default_rng(0)
    b, v = 2, 512
    feat, coords, mask = _sorted_inputs(rng, b, v, c, n_valid=[500, 17])

    want = np.asarray(scatter_to_bev(feat, coords, mask, NY, NX))
    got = np.asarray(canvas_from_sorted(feat, coords, mask, NY, NX,
                                        interpret=True))
    # split-bf16 reconstruction: ~2^-17 relative
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_canvas_bf16_emit():
    """bf16 mode: kernel output equals the bf16-rounded scatter reference."""
    rng = np.random.default_rng(2)
    b, v, c = 2, 512, 160
    feat, coords, mask = _sorted_inputs(rng, b, v, c, n_valid=[500, 17])

    want = np.asarray(scatter_to_bev(feat.astype(jnp.bfloat16), coords, mask,
                                     NY, NX)).astype(np.float32)
    got = np.asarray(canvas_from_sorted(feat, coords, mask, NY, NX,
                                        interpret=True,
                                        out_dtype=jnp.bfloat16))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(got.astype(np.float32), want, rtol=1e-2,
                               atol=1e-1)


def test_canvas_dense_tile():
    """A fully dense region (every cell of some tiles occupied) still fits
    the two-block pillar window."""
    rng = np.random.default_rng(1)
    b, c = 1, 8
    v = NY * NX  # one pillar in EVERY cell
    feat = jnp.asarray(rng.normal(size=(b, v, c)).astype(np.float32))
    cells = np.arange(NY * NX)
    coords = np.zeros((b, v, 3), np.int32)
    coords[0, :, 1] = cells // NX
    coords[0, :, 2] = cells % NX
    mask = jnp.ones((b, v), bool)

    want = np.asarray(scatter_to_bev(feat, jnp.asarray(coords), mask, NY, NX))
    got = np.asarray(canvas_from_sorted(feat, jnp.asarray(coords), mask,
                                        NY, NX, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_canvas_all_empty():
    rng = np.random.default_rng(2)
    feat, coords, mask = _sorted_inputs(rng, 1, 64, 16, n_valid=[0])
    got = np.asarray(canvas_from_sorted(feat, coords, mask, NY, NX,
                                        interpret=True))
    assert (got == 0).all()
