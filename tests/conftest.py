import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware. Must be set before jax import.
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

# The CPU backend in this jaxlib defaults to low-precision f32 matmuls
# (bf16 passes); numeric tests need true f32.
import jax  # noqa: E402

jax.config.update('jax_default_matmul_precision', 'highest')
