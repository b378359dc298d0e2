"""End-to-end A/B of the memory top-k lowering modes (VERDICT round-1 #3).

Runs the full eval pipeline (VFE -> memory scatter -> backbone -> head ->
post-processing) twice on identical parameters — TOPK_MODE='exact'
(lax.top_k oracle) vs 'fused' (threshold-superset kernel) and 'approx'
(approx_max_k, recall 0.9) — and bounds the detection-level deltas. The
accuracy tolerance mirrors the BASELINE AP gate (0.3): score deltas far
below it imply AP deltas below it.
"""

import copy

import jax
import numpy as np
import pytest

from hvpr_tpu.models import build_network
from hvpr_tpu.models.detectors.detector3d_template import post_processing

from tests.test_model import tiny_model_cfg, _FakeDataset, make_batch


def _run_eval(mode, variables, batch, cfg):
    cfg = copy.deepcopy(cfg)
    cfg['MAP_TO_BEV']['TOPK_MODE'] = mode
    net = build_network(cfg, num_class=1, dataset=_FakeDataset())
    out = net.module.apply(variables, batch, train=False)
    res = post_processing(out, cfg['POST_PROCESSING'], 1)
    return {k: np.asarray(v) for k, v in res.items()}


@pytest.fixture(scope='module')
def ab_setup():
    cfg = tiny_model_cfg()
    net = build_network(cfg, num_class=1, dataset=_FakeDataset())
    batch = make_batch(np.random.default_rng(3), with_gt=False)
    variables = net.init(jax.random.PRNGKey(1), batch, train=False)
    exact = _run_eval('exact', variables, batch, cfg)
    return cfg, variables, batch, exact


@pytest.mark.parametrize('mode', ['fused', 'approx'])
def test_detections_match_exact_topk(ab_setup, mode):
    cfg, variables, batch, exact = ab_setup
    got = _run_eval(mode, variables, batch, cfg)

    # same detection count and the same surviving boxes post-NMS
    assert got['pred_mask'].sum() == exact['pred_mask'].sum()

    m = exact['pred_mask'] & got['pred_mask']
    score_delta = np.abs(got['pred_scores'] - exact['pred_scores'])[m]
    box_delta = np.abs(got['pred_boxes'] - exact['pred_boxes'])[m]
    # 'fused' selects a superset with exact softmax -> rounding-level only;
    # 'approx' may miss tail items -> still far below the 0.3 AP tolerance.
    tol = 5e-3 if mode == 'fused' else 5e-2
    assert score_delta.max(initial=0.0) < tol, score_delta.max()
    assert box_delta.max(initial=0.0) < tol * 20, box_delta.max()
