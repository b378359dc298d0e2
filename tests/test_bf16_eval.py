"""bf16 inference path (CANVAS_DTYPE + COMPUTE_DTYPE) sanity vs f32.

The serving config runs the eval-path BEV canvas and conv pyramid in
bfloat16 (hvpr.yaml). This bounds the drift on the tiny model; the AP-level
bound is tests/test_topk_ap_ab.py (slow tier).
"""

import copy

import jax
import numpy as np
import pytest

from hvpr_tpu.models import build_network
from hvpr_tpu.models.detectors.detector3d_template import post_processing

from tests.test_model import tiny_model_cfg, _FakeDataset, make_batch


def _run(cfg, variables, batch):
    net = build_network(cfg, num_class=1, dataset=_FakeDataset())
    out = net.module.apply(variables, batch, train=False)
    res = post_processing(out, cfg['POST_PROCESSING'], 1)
    return {k: np.asarray(v) for k, v in res.items()}


def test_bf16_eval_close_to_f32():
    cfg = tiny_model_cfg()
    net = build_network(cfg, num_class=1, dataset=_FakeDataset())
    batch = make_batch(np.random.default_rng(5), with_gt=False)
    variables = net.init(jax.random.PRNGKey(2), batch, train=False)

    f32 = _run(cfg, variables, batch)

    cfg_bf16 = copy.deepcopy(cfg)
    cfg_bf16['MAP_TO_BEV']['CANVAS_DTYPE'] = 'bf16'
    cfg_bf16['BACKBONE_2D']['COMPUTE_DTYPE'] = 'bf16'
    bf16 = _run(cfg_bf16, variables, batch)

    assert np.isfinite(bf16['pred_scores']).all()
    assert np.isfinite(bf16['pred_boxes']).all()
    # final preds are f32 (the head promotes); drift is bf16-rounding level
    m = f32['pred_mask'] & bf16['pred_mask']
    if m.any():
        assert np.abs(bf16['pred_scores'] - f32['pred_scores'])[m].max() < 0.05
        assert np.abs(bf16['pred_boxes'] - f32['pred_boxes'])[m].max() < 0.5
