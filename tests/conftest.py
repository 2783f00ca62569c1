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
# No persistent compile cache for the CPU suite: XLA:CPU's AOT
# executable (de)serialization is unreliable on machines whose detected
# CPU features differ from the cache writer's (it warns about SIGILL and
# has produced segfaults inside cache writes). The TPU benchmark keeps
# its own cache — the XLA:TPU serializer does not share this problem.
