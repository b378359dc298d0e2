"""Worker for the 2-process multi-host test (spawned by test_multihost.py).

Usage: python multihost_worker.py <coordinator_port> <process_id> <tmpdir>

Each worker is one "host": 4 virtual CPU devices, joined into one 8-device
global mesh via jax.distributed. Exercises the full multi-host surface the
reference covers with NCCL (common_utils.py:114-195): cluster init, global
collectives, per-process batch sharding, a BatchNorm'd train step (SyncBN
semantics), and the tmpdir-pickle eval merge run twice (re-entrancy).
"""

import os
import sys
from pathlib import Path

port, process_id, tmpdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  str(Path(__file__).resolve().parent / '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402
import optax  # noqa: E402

from hvpr_tpu.parallel import (TrainState, make_mesh, make_train_step,  # noqa: E402
                               shard_host_batch)
from hvpr_tpu.utils.common_utils import (get_dist_info, init_dist_jax,  # noqa: E402
                                         merge_results_dist)

rank, world_size = init_dist_jax(
    coordinator_address=f'localhost:{port}', num_processes=2,
    process_id=process_id)
assert (rank, world_size) == (process_id, 2), (rank, world_size)
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

mesh = make_mesh()

# --- cross-process collective: global sum of a process-sharded batch -------
local = np.full((4, 3), float(rank + 1), np.float32)        # global (8, 3)
global_x = shard_host_batch({'x': local}, mesh)['x']
assert global_x.shape == (8, 3)
total = jax.jit(jnp.sum)(global_x)
assert float(total) == (1 + 2) * 4 * 3, float(total)

# --- BatchNorm'd train step over the global mesh (SyncBN semantics) --------
class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, batch, train=False):
        h = nn.Dense(8)(batch['points'])
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        pred = nn.Dense(1)(h)[..., 0]
        loss = jnp.mean((pred - batch['y']) ** 2)
        return {'loss': loss, 'tb_dict': {}}


net = TinyNet()
rng = np.random.RandomState(0)                               # same on both ranks
full_pts = rng.randn(8, 3).astype(np.float32)
full_y = rng.randn(8).astype(np.float32)
local_batch = {'points': full_pts[rank * 4:(rank + 1) * 4],
               'y': full_y[rank * 4:(rank + 1) * 4]}

variables = net.init(jax.random.PRNGKey(0), {'points': full_pts, 'y': full_y},
                     train=True)
tx = optax.sgd(0.1)
state = TrainState.create(variables, tx)
step = make_train_step(net, tx, mesh=mesh, donate=False)
sharded = shard_host_batch(local_batch, mesh)
state, metrics = step(state, sharded)

# the BN batch mean must be the GLOBAL batch mean — identical on both ranks
# and equal to a single-process reference computed from the full batch
bn_mean = np.asarray(
    jax.device_get(state.batch_stats['BatchNorm_0']['mean']))
ref_vars = net.init(jax.random.PRNGKey(0), {'points': full_pts, 'y': full_y},
                    train=True)
_, ref_mut = net.apply(ref_vars, {'points': full_pts, 'y': full_y},
                       train=True, mutable=['batch_stats'])
ref_mean = np.asarray(ref_mut['batch_stats']['BatchNorm_0']['mean'])
np.testing.assert_allclose(bn_mean, ref_mean, rtol=1e-5, atol=1e-6)

# --- eval-result merge, twice in the same tmpdir (re-entrancy) -------------
for round_i in range(2):
    part = [f'r{round_i}_rank{rank}_item{i}' for i in range(3)]
    merged = merge_results_dist(part, size=6, tmpdir=tmpdir)
    if rank == 0:
        assert merged == ['r%d_rank0_item0' % round_i, 'r%d_rank1_item0' % round_i,
                          'r%d_rank0_item1' % round_i, 'r%d_rank1_item1' % round_i,
                          'r%d_rank0_item2' % round_i, 'r%d_rank1_item2' % round_i], merged
    else:
        assert merged is None

print(f'MULTIHOST_OK rank={rank} loss={float(metrics["loss"]):.6f}')
