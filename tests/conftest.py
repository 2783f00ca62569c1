"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is
exercised on a host-platform device mesh instead. The platform override
must go through ``jax.config`` (not the env var) because the environment's
TPU plugin takes precedence over ``JAX_PLATFORMS``.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# Persistent compile cache: repeat suite runs skip XLA compilation.
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                 '/tmp/nautilus_tpu_test_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
