"""FLOP / byte accounting and MFU (model FLOPs utilization) reporting.

The reference has no utilization accounting at all — its only perf metric is
the wall-clock ``sec_per_test`` (/root/reference/tools/eval_utils/
eval_utils.py:84-86). Here every perf artifact (bench.py, TRAIN_PROFILE.json,
tools/profile_stages.py, tools/profile_train_stages.py) carries achieved
FLOP/s vs chip peak and HBM-bandwidth utilization, so the remaining headroom
per stage is a measured number instead of a guess (VERDICT r4 #2).

Two FLOP sources, combined by the profilers:

- **XLA HLO cost analysis** (:func:`xla_cost`) — exact for everything XLA
  compiles (the conv pyramid, heads, XLA-lowered ops). Custom calls (our
  Pallas kernels) report ZERO flops there, hence:
- **Analytic top-ups** for each Pallas kernel family — the matmul/reduction
  FLOP formulas below, derived from the kernel definitions (ops/
  memory_lookup.py, topk_attend.py, memory_recon.py). These count the same
  madds-as-2-flops convention XLA uses, on the PADDED shapes the kernels
  actually execute (lane/sublane padding is real MXU work).

MFU here = total_flops / seconds / bf16 peak — the standard definition
(achieved throughput over the chip's best-case matmul throughput). A stage
doing f32 VPU work has a lower attainable peak, so its *attainable*
utilization is higher than the reported MFU; MFU is the conservative,
comparable number. HBM utilization = XLA-reported "bytes accessed" (plus
operand/result bytes for Pallas calls) / seconds / peak bandwidth — an
approximation (XLA counts bytes per-op, so fusion-internal traffic that
never reaches HBM inflates it), useful for naming the dominant bound, not
for precision.
"""

import os

import numpy as np

# Public TPU peak numbers (per chip). v5e (aka "TPU v5 lite"): 197 TFLOP/s
# bf16, 819 GB/s HBM. Override via env for other chips.
_PEAKS = {
    # device_kind substring -> (bf16 TFLOP/s, HBM GB/s)
    'v5 lite': (197.0, 819.0),
    'v5litepod': (197.0, 819.0),
    'v5e': (197.0, 819.0),
    'v5p': (459.0, 2765.0),
    'v4': (275.0, 1228.0),
    'v6 lite': (918.0, 1640.0),
    'v6e': (918.0, 1640.0),
}
_DEFAULT_PEAK = (197.0, 819.0)  # assume v5e (the build target, BASELINE.md)


def device_peaks():
    """(bf16 peak FLOP/s, HBM bytes/s) for jax.devices()[0].

    Env overrides: HVPR_PEAK_TFLOPS / HVPR_HBM_GBPS.
    """
    tflops = os.environ.get('HVPR_PEAK_TFLOPS')
    gbps = os.environ.get('HVPR_HBM_GBPS')
    if tflops and gbps:
        return float(tflops) * 1e12, float(gbps) * 1e9
    kind = ''
    try:
        import jax
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        pass
    peak = _DEFAULT_PEAK
    for sub, p in _PEAKS.items():
        if sub in kind:
            peak = p
            break
    return (float(tflops) * 1e12 if tflops else peak[0] * 1e12,
            float(gbps) * 1e9 if gbps else peak[1] * 1e9)


def xla_cost(compiled):
    """(flops, bytes_accessed) from a compiled computation's cost analysis.

    ``compiled`` is the result of ``jax.jit(fn).lower(*args).compile()``.
    Pallas custom calls contribute 0 flops — add the analytic top-ups below.
    """
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get('flops', 0.0)), float(ca.get('bytes accessed', 0.0))


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# analytic Pallas top-ups (padded shapes, madd = 2 flops)
# ---------------------------------------------------------------------------


def memory_lookup_fused_flops(rows, m, c):
    """ops/memory_lookup.py: bmax logits (2*r*M*C) + apply logits (2*r*M*C)
    + output matmul (2*r*M*C); the k-iteration threshold loop is O(r*128*k),
    negligible. Padded M/C as the kernels run them."""
    mp = _round_up(m, 128)
    cp = _round_up(c, 128)
    return 6.0 * rows * mp * cp


def bucket_threshold_flops(b, v, n, c):
    """ops/topk_attend.py bucket_threshold: one (V, C) x (C, N) score matmul
    per batch; the bucket max/threshold loop is O(V*128*k), negligible."""
    return 2.0 * b * _round_up(v, 256) * _round_up(n, 128) * _round_up(c, 128)


def masked_attend_flops(b, v, n, c, shared, with_bwd):
    """ops/topk_attend.py masked_attend: fwd = selection scores (2BVNC)
    [+ aggregation logits (2BVNC) when not shared] + output matmul (2BVNC);
    bwd recomputes the weight tile (same matmuls minus the output) and adds
    the transposed d_val matmul (2BVNC)."""
    unit = 2.0 * b * _round_up(v, 256) * _round_up(n, 128) * _round_up(c, 128)
    fwd = unit * (2 if shared else 3)
    if not with_bwd:
        return fwd
    bwd = unit * ((1 if shared else 2) + 1)
    return fwd + bwd


def memory_recon_flops(rows, m, c, with_bwd):
    """ops/memory_recon.py: fwd = addressing logits (2*r*M*C) + shrink/renorm
    (O(r*M), negligible) + reconstruction (2*r*M*C); bwd recomputes the
    attention tile and runs the two cotangent matmuls (d_points, d_mem)."""
    mp = _round_up(m, 128)
    cp = _round_up(c, 128)
    unit = 2.0 * rows * mp * cp
    return unit * (2 if not with_bwd else 6)


def tensor_bytes(*arrays):
    """Total nbytes of operands/results — the HBM top-up for a Pallas call
    that streams each operand once (all of ours do)."""
    return float(sum(np.prod(a.shape) * a.dtype.itemsize for a in arrays))


# ---------------------------------------------------------------------------
# reporting
# ---------------------------------------------------------------------------


def utilization(flops, bytes_accessed, seconds):
    """dict(mfu, hbm_frac, bound) for one measured region."""
    peak_flops, peak_bw = device_peaks()
    mfu = flops / seconds / peak_flops if seconds > 0 else 0.0
    hbm = bytes_accessed / seconds / peak_bw if seconds > 0 else 0.0
    if mfu < 0.02 and hbm < 0.1:
        bound = 'latency/host'
    elif mfu >= hbm:
        bound = 'compute'
    else:
        bound = 'hbm'
    return {'mfu': round(mfu, 4), 'hbm_frac': round(hbm, 4), 'bound': bound}
