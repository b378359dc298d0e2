"""Batched pillar -> BEV dense scatter (pure JAX).

TPU-native replacement for the reference per-sample Python scatter loop
(pointpillar_scatter.py:17-33, 101-150): the ragged batch-idx-prefixed
coordinate list becomes one batched scatter over fixed-shape (B, V, C)
tensors with a validity mask; padded pillars are routed to a dump row that
is sliced away. Output is NHWC (TPU-native conv layout).
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=('ny', 'nx'))
def scatter_to_bev(features, coords, mask, ny, nx):
    """Scatter per-pillar features into a dense BEV image.

    TPU note: a direct wide scatter into the (ny*nx, C) canvas is
    output-size bound (~40 ms for a 16-scan batch at C=160 — XLA's scatter
    lowering, measured). Instead the scatter is NARROW — an int32 row-id map
    (4 bytes/cell) — and the wide canvas is built by a GATHER, which streams
    at HBM bandwidth (~5 ms for the same shape).

    Args:
        features: (B, V, C) pillar features.
        coords: (B, V, 3) int (z, y, x) grid coords.
        mask: (B, V) bool pillar validity.
        ny, nx: static grid dims.

    Returns:
        (B, ny, nx, C) dense BEV map (NHWC).
    """
    b, v, c = features.shape
    flat_idx = coords[..., 1] * nx + coords[..., 2]              # (B, V)
    flat_idx = jnp.where(mask, flat_idx, ny * nx)                # dump slot

    def scatter_one(feat, idx):
        rowid = jnp.full((ny * nx + 1,), v, dtype=jnp.int32)
        rowid = rowid.at[idx].set(jnp.arange(v, dtype=jnp.int32),
                                  mode='drop')[:ny * nx]
        # empty cells point at an appended zero row — the masking happens
        # inside the gather itself (a separate where pass re-streams the
        # whole 750 MB canvas)
        feat_ext = jnp.concatenate([feat, jnp.zeros((1, c), feat.dtype)], 0)
        return feat_ext[rowid]

    canvas = jax.vmap(scatter_one)(features, flat_idx)           # (B, ny*nx, C)
    return canvas.reshape(b, ny, nx, c)


def segment_broadcast_max_t(x_t, safe_slot, max_seg=32):
    """Per-row segment max in channel-major layout, no gathers.

    Flat-layout invariants: segments are contiguous runs of <= ``max_seg``
    rows; ``safe_slot`` must already carry a sentinel on invalid rows and
    ``x_t`` -1e9 there. Two masked
    doubling-scan sweeps — a forward running max then a reverse running max
    of it — leave EVERY row holding its segment's max, so the result can be
    consumed in row space (layer-to-layer concat) or extracted at any row of
    the segment. All passes are lane-aligned streaming VPU work.

    Args:
        x_t: (C, R) rows channel-major, invalid rows at -1e9.
        safe_slot: (R,) int32 slot ids, sentinel on invalid rows.
    Returns:
        (C, R) with every row replaced by its segment's max.
    """
    neg = jnp.asarray(-1e9, x_t.dtype)

    def sweep(y, reverse):
        d = 1
        while d < max_seg:
            if reverse:
                same = (safe_slot[:-d] == safe_slot[d:])[None, :]
                nxt = jnp.where(same, y[:, d:], neg)
                y = jnp.concatenate([jnp.maximum(y[:, :-d], nxt), y[:, -d:]],
                                    axis=1)
            else:
                same = (safe_slot[d:] == safe_slot[:-d])[None, :]
                prv = jnp.where(same, y[:, :-d], neg)
                y = jnp.concatenate([y[:, :d], jnp.maximum(y[:, d:], prv)],
                                    axis=1)
            d *= 2
        return y

    return sweep(sweep(x_t, reverse=False), reverse=True)


def segment_sums_t(x_t, safe_slot, max_seg=32):
    """Per-row FULL segment sum in channel-major layout (no gathers).

    ``full[i] = prefix_incl[i] + suffix_incl[i] - x[i]`` with both scans as
    masked doubling sweeps (same invariants as segment_broadcast_max_t;
    invalid rows must carry x = 0 and a sentinel slot).
    """
    def sweep(y, reverse):
        d = 1
        while d < max_seg:
            if reverse:
                same = (safe_slot[:-d] == safe_slot[d:])[None, :]
                nxt = jnp.where(same, y[:, d:], 0.0)
                y = jnp.concatenate([y[:, :-d] + nxt, y[:, -d:]], axis=1)
            else:
                same = (safe_slot[d:] == safe_slot[:-d])[None, :]
                prv = jnp.where(same, y[:, :-d], 0.0)
                y = jnp.concatenate([y[:, :d], y[:, d:] + prv], axis=1)
            d *= 2
        return y

    return sweep(x_t, False) + sweep(x_t, True) - x_t


def segment_last_row(safe_slot, num_slots):
    """Index of each slot's last valid row: (num_slots,) int32, -1 if empty."""
    r = safe_slot.shape[0]
    last = jnp.full((num_slots + 1,), -1, dtype=jnp.int32)
    return last.at[safe_slot].max(jnp.arange(r, dtype=jnp.int32),
                                  mode='drop')[:num_slots]


