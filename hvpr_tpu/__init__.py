"""hvpr_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the HVPR 3D detection stack.

Same capabilities as cvlab-yonsei/HVPR (CVPR 2021) / OpenPCDet v0.3, re-designed
for TPU: fixed-shape batched tensors, pure-functional flax models, device-side
voxelization and rotated NMS, and data-parallel training over a jax.sharding.Mesh.
"""

__version__ = '0.1.0'


def _honor_jax_platforms_env():
    """Re-assert the standard ``JAX_PLATFORMS`` env contract.

    Some deployment images pre-import jax from a ``sitecustomize`` hook that
    registers an accelerator plugin and overwrites ``jax_platforms`` at
    interpreter start — silently discarding a ``JAX_PLATFORMS`` the user set
    (e.g. ``JAX_PLATFORMS=cpu`` for a host-only run of the CLI tools). Apply
    the env var to ``jax.config`` on package import, which is always before
    the first computation in the CLI tools/tests, restoring normal JAX
    semantics. No-op when the env var is unset or backends already match.
    """
    import os
    env = os.environ.get('JAX_PLATFORMS')
    if not env:
        return
    try:
        import jax
        cur = jax.config.jax_platforms or ''
        env_list = [p for p in env.split(',') if p]
        cur_list = [p for p in cur.split(',') if p]
        # already honored when the env platforms lead the current selection
        # (e.g. env 'axon' vs hook-set 'axon,cpu' keeps the cpu fallback);
        # override only when the env choice is not what would be picked
        if cur_list[:len(env_list)] != env_list:
            jax.config.update('jax_platforms', env)
    except Exception:  # jax missing/too old: never block package import
        pass


_honor_jax_platforms_env()
