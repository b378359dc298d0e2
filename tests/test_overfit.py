"""End-to-end training math validation: overfit one synthetic scene.

If the loss pipeline (target assignment, focal/reg/dir losses, OneCycle/AdamW
step) is correct, a detector must drive its loss far down on a single repeated
batch and actually detect the ground-truth boxes afterwards.

The plain PointPillar detector is used for the recall check: HVPR's eval path
swaps the point stream for memory lookups, which only align after the memory
dictionary has trained for far longer than an overfit test (its loss decrease
is still asserted).
"""

import jax
import numpy as np
import pytest

from hvpr_tpu.config import ConfigDict
from tests.test_model import tiny_model_cfg, make_batch, _FakeDataset


def _train(cfg, n_steps, batch):
    from hvpr_tpu.models import build_network
    from hvpr_tpu.optimization import build_optimizer
    from hvpr_tpu.parallel import TrainState, make_train_step

    net = build_network(cfg, num_class=1, dataset=_FakeDataset())
    variables = net.init(jax.random.PRNGKey(0), batch)
    optim_cfg = {'OPTIMIZER': 'adam_onecycle', 'LR': 3e-3, 'WEIGHT_DECAY': 0.0,
                 'MOMS': [0.95, 0.85], 'PCT_START': 0.4, 'DIV_FACTOR': 10,
                 'GRAD_NORM_CLIP': 10}
    tx, _ = build_optimizer(variables['params'], optim_cfg, total_steps=n_steps)
    step = make_train_step(net.module, tx, mesh=None, donate=False)
    state = TrainState.create(variables, tx)

    first = last = None
    for i in range(n_steps):
        state, metrics = step(state, batch)
        if i == 0:
            first = float(metrics['loss'])
    last = float(metrics['loss'])
    net.variables = {'params': state.params, 'batch_stats': state.batch_stats}
    return net, first, last


def test_overfit_pointpillar_detects_gt():
    cfg = tiny_model_cfg()
    del cfg['BACKBONE_3D']
    cfg['NAME'] = 'PointPillar'
    cfg['VFE']['NAME'] = 'PillarVFE'
    cfg['MAP_TO_BEV'] = ConfigDict({'NAME': 'PointPillarScatter',
                                    'NUM_BEV_FEATURES': 32})
    cfg['BACKBONE_2D']['NAME'] = 'BaseBEVBackbone'
    # 200 steps overfit localizes perfectly but the focal-loss classifier is
    # still climbing toward confident scores; relax the serving threshold
    cfg['POST_PROCESSING']['SCORE_THRESH'] = 0.01

    rng = np.random.default_rng(0)
    batch = make_batch(rng, batch_size=2)
    net, first, last = _train(cfg, 200, batch)

    assert np.isfinite(last)
    assert last < first * 0.25, (first, last)

    out = net.eval_forward(batch)
    assert int(out['recall']['gt']) == 4
    assert int(out['recall']['roi_0.3']) >= 3, dict(out['recall'])
    assert int(out['recall']['rcnn_0.3']) >= 3, dict(out['recall'])


@pytest.mark.slow
@pytest.mark.parametrize('compute_dtype', ['fp32', 'bf16'])
def test_hvpr_loss_decreases(compute_dtype):
    """Training convergence for both backbone compute dtypes.

    The flagship config trains the 2D conv pyramid in bf16 (TPU-native mixed
    precision: bf16 activations/gradients, f32 params + BN stats, SURVEY
    section 2c); the bf16 case validates that the training math still
    converges, not just the eval path (tests/test_bf16_eval.py).
    """
    cfg = tiny_model_cfg()
    cfg['BACKBONE_2D']['COMPUTE_DTYPE'] = compute_dtype
    # the flagship config also runs the point stream and the fused head in
    # bf16 (round 5); cover the full mixed-precision training path
    cfg['BACKBONE_3D']['COMPUTE_DTYPE'] = compute_dtype
    cfg['DENSE_HEAD']['COMPUTE_DTYPE'] = compute_dtype
    rng = np.random.default_rng(1)
    batch = make_batch(rng, batch_size=2)
    net, first, last = _train(cfg, 60, batch)
    assert np.isfinite(last)
    assert last < first * 0.5, (first, last)
