import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware. NOTE: this environment's sitecustomize force-registers
# the axon TPU backend and PREPENDS it to jax_platforms, so the env var alone
# is not enough — jax.config must be overridden after import.
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# true f32 matmuls for numeric comparisons
jax.config.update('jax_default_matmul_precision', 'highest')

# The persistent compilation cache segfaults this jaxlib while serializing
# the largest e2e executables (observed: SIGSEGV inside
# compilation_cache.put_executable_and_time at ~test 107 of the full suite,
# twice, same spot; individual files pass). Tests don't benefit from it —
# disable.
jax.config.update('jax_enable_compilation_cache', False)
