"""Rotated BEV / 3D IoU on device (pure JAX, jit-safe, fixed shapes).

TPU-native replacement for the reference CUDA ops ``boxes_iou_bev``,
``boxes_iou3d_gpu`` and ``boxes_bev_iou_cpu`` (reference: pcdet/ops/iou3d_nms,
declared setup.py:54-62, used by axis_aligned_target_assigner.py:145,
detector3d_template.py:298, database_sampler.py:184).

Algorithm (chosen for TPU): the intersection area of two convex quads is
computed via Green's theorem over the boundary of the intersection —

    2 * Area(P ∩ Q) = sum over edges e of P of  cross(s_e, t_e)
                    + sum over edges e of Q of  cross(s_e, t_e)

where [s_e, t_e] is the portion of edge e lying inside the other quad,
found by clipping the edge's parameter interval against the 4 half-planes
of the other box (a max/min over entering/exiting crossings — NO polygon
vertex sort, NO compaction, NO atan2). Every intermediate is an (N, M)
plane, so XLA tiles perfectly onto the VPU; the naive fixed-size
candidate-vertex formulation creates (N, M, 24, 2) tensors whose tiny
trailing dims pad 5x+ under TPU (8, 128) tiling and run orders of
magnitude slower.

Shared-boundary double counting is avoided by clipping P's edges against
a closed Q (f >= 0) but Q's edges against the open interior of P (f > 0).
"""

import jax
import jax.numpy as jnp
import numpy as np

# Robustness margin on half-plane tests, in units of edge_length * meters.
# Must exceed fp32 noise on f = cross(edge, p - q1) (~1e-4 for KITTI-scale
# coords); geometric error introduced is EPS/edge_length ~ 1e-3 m.
_EPS = 1e-3


def box_to_corners_bev(boxes, xp=jnp):
    """(..., 5) [x, y, dx, dy, heading] -> (..., 4, 2) corners, CCW order."""
    x, y, dx, dy, r = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3], boxes[..., 4])
    cosa, sina = xp.cos(r), xp.sin(r)
    lx = xp.stack([dx, dx, -dx, -dx], axis=-1) * 0.5
    ly = xp.stack([-dy, dy, dy, -dy], axis=-1) * 0.5
    cx = x[..., None] + lx * cosa[..., None] - ly * sina[..., None]
    cy = y[..., None] + lx * sina[..., None] + ly * cosa[..., None]
    return xp.stack([cx, cy], axis=-1)


def _edge_contributions(cp, cq, strict, xp=jnp):
    """Sum of cross(s_e, t_e) over the 4 edges of each P clipped inside each Q.

    Args:
        cp: (N, 4, 2) subject quad corners (CCW).
        cq: (M, 4, 2) clipper quad corners (CCW).
        strict: clip against the open interior (f > 0) instead of closed (f >= 0).
    Returns:
        (N, M) summed contributions (twice the signed area of the pieces).
    """
    total = 0.0
    # clipper half-plane data, precomputed once: (M, 4)
    q1 = cq                      # (M, 4, 2)
    q2 = xp.roll(cq, -1, axis=1)
    ux = (q2[..., 0] - q1[..., 0])  # (M, 4)
    uy = (q2[..., 1] - q1[..., 1])
    # f(p) = ux*(py - q1y) - uy*(px - q1x);  rewrite as  f(p) = ux*py - uy*px + c
    c = uy * q1[..., 0] - ux * q1[..., 1]   # (M, 4)

    for e in range(4):
        ax, ay = cp[:, e, 0], cp[:, e, 1]               # (N,)
        bx, by = cp[:, (e + 1) % 4, 0], cp[:, (e + 1) % 4, 1]
        dxe = bx - ax                                    # (N,)
        dye = by - ay

        t_lo = xp.zeros(())
        t_hi = xp.ones(())
        empty = xp.zeros((), dtype=bool)
        degenerate = xp.zeros((), dtype=bool)
        for h in range(4):
            # fa, fb: (N, M) signed distances of edge endpoints to half-plane h
            fa = ux[None, :, h] * ay[:, None] - uy[None, :, h] * ax[:, None] + c[None, :, h]
            fb = ux[None, :, h] * by[:, None] - uy[None, :, h] * bx[:, None] + c[None, :, h]
            if strict:
                # open interior: points on (or eps-near) the boundary count as
                # outside, so boundary-collinear pieces are only counted once
                a_out, b_out = fa < _EPS, fb < _EPS
            else:
                a_out, b_out = fa < -_EPS, fb < -_EPS
                # ANTI-parallel boundary-collinear edge: the quads merely abut
                # along this line (their interiors are on opposite sides), so
                # the intersection is a zero-area segment whose two opposed
                # traversals must cancel. The strict pass already drops the
                # clipper's traversal; drop this one too or the segment's
                # full cross term survives as spurious area (a CCW-parallel
                # collinear edge — genuine shared boundary — stays counted
                # exactly once, here).
                anti = (ux[None, :, h] * dxe[:, None]
                        + uy[None, :, h] * dye[:, None]) < 0
                near = (xp.abs(fa) < _EPS) & (xp.abs(fb) < _EPS)
                degenerate = degenerate | (near & anti)
            empty = empty | (a_out & b_out)
            denom = fa - fb
            t_cross = fa / xp.where(denom == 0, 1.0, denom)
            t_lo = xp.maximum(t_lo, xp.where(a_out & ~b_out, t_cross, 0.0))
            t_hi = xp.minimum(t_hi, xp.where(b_out & ~a_out, t_cross, 1.0))

        keep = (~empty) & (~degenerate) & (t_hi > t_lo)
        # p0 = a + t_lo * d, p1 = a + t_hi * d; cross(p0, p1)
        p0x = ax[:, None] + t_lo * dxe[:, None]
        p0y = ay[:, None] + t_lo * dye[:, None]
        p1x = ax[:, None] + t_hi * dxe[:, None]
        p1y = ay[:, None] + t_hi * dye[:, None]
        contrib = p0x * p1y - p0y * p1x
        total = total + xp.where(keep, contrib, 0.0)
    return total


def boxes_overlap_bev(boxes_a, boxes_b):
    """Pairwise rotated-bev intersection areas.

    Args:
        boxes_a: (N, 7+) [x, y, z, dx, dy, dz, heading, ...]
        boxes_b: (M, 7+)
    Returns:
        (N, M) intersection areas.
    """
    ca = box_to_corners_bev(boxes_a[:, [0, 1, 3, 4, 6]])  # (N, 4, 2)
    cb = box_to_corners_bev(boxes_b[:, [0, 1, 3, 4, 6]])  # (M, 4, 2)
    two_area = _edge_contributions(ca, cb, strict=False) \
        + _edge_contributions(cb, ca, strict=True).T
    # intersection <= min(area_a, area_b) always; the clamp bounds any
    # residual eps-band pathology so IoU can never exceed 1
    cap = jnp.minimum((boxes_a[:, 3] * boxes_a[:, 4])[:, None],
                      (boxes_b[:, 3] * boxes_b[:, 4])[None, :])
    return jnp.clip(0.5 * two_area, 0.0, cap)


def boxes_iou_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV IoU. (N, 7) x (M, 7) -> (N, M)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, 1e-6, None)


def boxes_iou3d(boxes_a, boxes_b):
    """Pairwise 3D IoU (z-center convention). (N, 7) x (M, 7) -> (N, M).

    Matches the semantics of the reference ``boxes_iou3d_gpu``.
    """
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)

    a_zmin = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    a_zmax = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    b_zmin = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    b_zmax = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    overlap_h = jnp.clip(jnp.minimum(a_zmax, b_zmax) - jnp.maximum(a_zmin, b_zmin), 0, None)

    overlap_3d = overlap_bev * overlap_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, 1e-6, None)


# jitted conveniences
boxes_iou_bev_jit = jax.jit(boxes_iou_bev)
boxes_iou3d_jit = jax.jit(boxes_iou3d)


def _overlap_bev_numpy(boxes_a, boxes_b):
    """Vectorized numpy twin of :func:`boxes_overlap_bev` (host fallback).

    Same Green's-theorem formulation through the shared xp-parametrized
    helpers — no device round-trip, no per-(N, M)-shape XLA recompiles."""
    ca = box_to_corners_bev(boxes_a[:, [0, 1, 3, 4, 6]], xp=np)
    cb = box_to_corners_bev(boxes_b[:, [0, 1, 3, 4, 6]], xp=np)
    two_area = _edge_contributions(ca, cb, strict=False, xp=np) \
        + _edge_contributions(cb, ca, strict=True, xp=np).T
    cap = np.minimum((boxes_a[:, 3] * boxes_a[:, 4])[:, None],
                     (boxes_b[:, 3] * boxes_b[:, 4])[None, :])
    return np.clip(0.5 * two_area, 0.0, cap).astype(np.float32)


def boxes_overlap_bev_cpu(boxes_a, boxes_b):
    """Host-side raw rotated-BEV intersection areas on numpy (N, 7) boxes.

    Used by the KITTI AP evaluator's overlap modes so the host metric never
    round-trips through jitted device code (which would recompile per
    (N, M) shape). Prefers the native C++ extension; the fallback is the
    vectorized numpy twin of the device kernel.
    """
    boxes_a = np.asarray(boxes_a, dtype=np.float32)
    boxes_b = np.asarray(boxes_b, dtype=np.float32)
    if boxes_a.shape[0] == 0 or boxes_b.shape[0] == 0:
        return np.zeros((boxes_a.shape[0], boxes_b.shape[0]), dtype=np.float32)
    from ..native import geometry as native_geometry
    if native_geometry.available():
        return native_geometry.boxes_overlap_bev(boxes_a, boxes_b)
    return _overlap_bev_numpy(boxes_a, boxes_b)


def boxes_bev_iou_cpu(boxes_a, boxes_b):
    """Host-side rotated BEV IoU on numpy inputs (gt-sampler collision test).

    Replacement for the reference C++ ``boxes_bev_iou_cpu``
    (database_sampler.py:184-185). Prefers the native C++ extension, falling
    back to the vectorized numpy twin of the device kernel.
    """
    boxes_a = np.asarray(boxes_a, dtype=np.float32)
    boxes_b = np.asarray(boxes_b, dtype=np.float32)
    if boxes_a.shape[0] == 0 or boxes_b.shape[0] == 0:
        return np.zeros((boxes_a.shape[0], boxes_b.shape[0]), dtype=np.float32)
    from ..native import geometry as native_geometry
    if native_geometry.available():
        return native_geometry.boxes_iou_bev(boxes_a, boxes_b)
    overlap = _overlap_bev_numpy(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / np.clip(area_a + area_b - overlap, 1e-6, None)
