"""Profiling/tracing hooks (aux subsystem, SURVEY.md §5.1).

The reference's only instrumentation is the eval wall-clock ``sec_per_test``
(eval_utils.py:53-86). This adds the TPU-native equivalents: jax.profiler
trace capture and a per-step timer that forces a device sync (on the axon
tunnel ``block_until_ready`` alone does not guarantee completion — a small
device_get does; see .claude/skills/verify/SKILL.md).
"""

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir):
    """Capture a jax.profiler trace around a code block (view with TensorBoard)."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree):
    """Force completion of a pytree of device arrays (tunnel-safe)."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, 'ravel')]
    if leaves:
        jax.device_get(leaves[-1].ravel()[0])
    return tree


class StepTimer:
    """Per-step wall-clock accounting with periodic device sync.

    Syncing every step serializes the pipeline; sync_every=N keeps the device
    queue busy while still bounding timing error.
    """

    def __init__(self, sync_every=10):
        self.sync_every = sync_every
        self.reset()

    def reset(self):
        self.count = 0
        self.start = time.time()

    def step(self, output_tree=None):
        self.count += 1
        if output_tree is not None and self.count % self.sync_every == 0:
            sync(output_tree)

    @property
    def sec_per_step(self):
        return (time.time() - self.start) / max(self.count, 1)
