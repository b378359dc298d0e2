"""Data-parallel train step on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_model import tiny_model_cfg, make_batch, _FakeDataset


@pytest.mark.slow
def test_train_step_8dev_mesh_loss_decreases():
    from hvpr_tpu.models import build_network
    from hvpr_tpu.optimization import build_optimizer
    from hvpr_tpu.parallel import (TrainState, make_mesh, make_train_step,
                                   shard_host_batch)

    assert len(jax.devices()) == 8, jax.devices()

    cfg = tiny_model_cfg()
    net = build_network(cfg, num_class=1, dataset=_FakeDataset())
    rng = np.random.default_rng(0)
    batch = make_batch(rng, batch_size=8)

    variables = net.module.init(jax.random.PRNGKey(0), batch, train=True)
    optim_cfg = {'OPTIMIZER': 'adam_onecycle', 'LR': 3e-3, 'WEIGHT_DECAY': 0.01,
                 'MOMS': [0.95, 0.85], 'PCT_START': 0.4, 'DIV_FACTOR': 10,
                 'GRAD_NORM_CLIP': 10}
    tx, lr_fn = build_optimizer(variables['params'], optim_cfg, total_steps=100)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    train_step = make_train_step(net.module, tx, mesh=mesh, donate=False)

    state = TrainState.create(variables, tx)
    sbatch = shard_host_batch(batch, mesh)

    losses = []
    for i in range(6):
        state, metrics = train_step(state, sbatch)
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6

    # lr schedule sanity: one-cycle rises from lr/div toward lr
    assert float(lr_fn(0)) < float(lr_fn(30))


def test_single_device_step_matches_mesh():
    """The mesh step must compute the same loss as the unsharded step."""
    from hvpr_tpu.models import build_network
    from hvpr_tpu.optimization import build_optimizer
    from hvpr_tpu.parallel import TrainState, make_mesh, make_train_step, shard_host_batch

    cfg = tiny_model_cfg()
    net = build_network(cfg, num_class=1, dataset=_FakeDataset())
    rng = np.random.default_rng(3)
    batch = make_batch(rng, batch_size=8)
    variables = net.module.init(jax.random.PRNGKey(2), batch, train=True)
    optim_cfg = {'OPTIMIZER': 'adam', 'LR': 1e-3, 'DECAY_STEP_LIST': [10],
                 'LR_DECAY': 0.1, 'LR_CLIP': 1e-7, 'GRAD_NORM_CLIP': 10}
    tx, _ = build_optimizer(variables['params'], optim_cfg, total_iters_each_epoch=10)

    state0 = TrainState.create(variables, tx)
    step_plain = make_train_step(net.module, tx, mesh=None, donate=False)
    _, m_plain = step_plain(state0, batch)

    mesh = make_mesh()
    step_mesh = make_train_step(net.module, tx, mesh=mesh, donate=False)
    state1 = TrainState.create(variables, tx)
    _, m_mesh = step_mesh(state1, shard_host_batch(batch, mesh))

    np.testing.assert_allclose(float(m_plain['loss']), float(m_mesh['loss']),
                               rtol=2e-4)
