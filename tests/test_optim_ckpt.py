"""OneCycle schedule semantics, checkpoint partial-load-by-shape, misc utils."""

import numpy as np

from hvpr_tpu.optimization import decay_step_schedule, one_cycle_lr_schedule


def test_one_cycle_schedule_shape():
    lr_max, total = 3e-3, 1000
    lr_fn, mom_fn = one_cycle_lr_schedule(lr_max, total, moms=(0.95, 0.85),
                                          div_factor=10, pct_start=0.4)
    # starts at lr_max/div, peaks at lr_max at pct_start, decays to ~lr_max/1e4*div
    assert abs(float(lr_fn(0)) - lr_max / 10) < 1e-6
    assert abs(float(lr_fn(400)) - lr_max) < 1e-5
    assert float(lr_fn(1000)) < lr_max / 100
    # momentum dips to 0.85 at peak and recovers
    assert abs(float(mom_fn(0)) - 0.95) < 1e-4
    assert abs(float(mom_fn(400)) - 0.85) < 1e-4
    assert abs(float(mom_fn(1000)) - 0.95) < 1e-4


def test_decay_step_schedule():
    lr_fn = decay_step_schedule(1e-2, [10, 20], 0.1, 1e-7,
                                total_iters_each_epoch=5)
    assert abs(float(lr_fn(0)) - 1e-2) < 1e-9
    assert abs(float(lr_fn(51)) - 1e-3) < 1e-9    # past epoch 10
    assert abs(float(lr_fn(101)) - 1e-4) < 1e-9   # past epoch 20
    lr_warm = decay_step_schedule(1e-2, [10], 0.1, 1e-7, 5,
                                  warmup_epoch=2, warmup=True)
    assert float(lr_warm(0)) < 2e-3               # warmup start ~0.1*lr


def test_checkpoint_partial_load_by_shape(tmp_path):
    import jax
    from hvpr_tpu.models import Network, build_network
    from tests.test_model import tiny_model_cfg, make_batch, _FakeDataset

    cfg = tiny_model_cfg()
    net = build_network(cfg, num_class=1, dataset=_FakeDataset())
    rng = np.random.default_rng(0)
    batch = make_batch(rng, batch_size=1)
    net.init(jax.random.PRNGKey(0), batch)

    # build a second net with a different memory size -> shape-mismatched keys
    cfg2 = tiny_model_cfg()
    cfg2['MAP_TO_BEV']['NUM_M'] = 37
    net2 = build_network(cfg2, num_class=1, dataset=_FakeDataset())
    net2.init(jax.random.PRNGKey(1), batch)

    before = np.asarray(net2.variables['params']['map_to_bev']['memory']['weight'])
    skipped = net2.load_state_dict(net.variables)
    assert any('memory' in s for s in skipped), skipped
    after = np.asarray(net2.variables['params']['map_to_bev']['memory']['weight'])
    np.testing.assert_array_equal(before, after)  # mismatched key untouched

    # a matching key was loaded
    src = np.asarray(net.variables['params']['vfe']['PFNLayer_0']['Dense_0']['kernel'])
    dst = np.asarray(net2.variables['params']['vfe']['PFNLayer_0']['Dense_0']['kernel'])
    np.testing.assert_array_equal(src, dst)


def test_metric_logger_and_profiler():
    from hvpr_tpu.utils.misc import MetricLogger, SmoothedValue
    from hvpr_tpu.utils.profiler import StepTimer

    m = MetricLogger()
    for i in range(5):
        m.update(loss=float(i))
    assert abs(m.meters['loss'].global_avg - 2.0) < 1e-9
    sv = SmoothedValue(window_size=2)
    sv.update(1.0)
    sv.update(3.0)
    assert sv.avg == 2.0

    t = StepTimer(sync_every=2)
    import jax.numpy as jnp
    for _ in range(4):
        t.step(jnp.ones(3))
    assert t.count == 4
    assert t.sec_per_step >= 0
