"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run
without TPU hardware.

The environment pre-imports jax with ``JAX_PLATFORMS=axon`` (TPU tunnel) via a
sitecustomize hook, so plain env-var edits are too late — the platform must be
overridden through ``jax.config`` before the backend initializes.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    flags = (flags + ' --xla_force_host_platform_device_count=8').strip()
if '--xla_cpu_collective_call_terminate_timeout_seconds' not in flags:
    # 8 virtual devices time-slice the host cores; large sharded test steps
    # can reach collectives minutes apart — beyond XLA's default 20s/40s
    # rendezvous watchdog, which would abort the process
    flags += (' --xla_cpu_collective_call_warn_stuck_timeout_seconds=600'
              ' --xla_cpu_collective_call_terminate_timeout_seconds=3600')
os.environ['XLA_FLAGS'] = flags
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: the suite is compile-dominated (same jitted
# programs every run); cached executables cut repeat runs by minutes.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), '.jax_cache')
jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
