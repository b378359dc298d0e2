"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run
without TPU hardware.

The environment pre-imports jax with ``JAX_PLATFORMS=axon`` (TPU tunnel) via a
sitecustomize hook, so plain env-var edits are too late — the platform must be
overridden through ``jax.config`` before the backend initializes.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
