"""fastpcc_tpu — TPU-native learned point-cloud-compression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
pengpeng-yu/FastPCC (reference: /root/reference): sparse-convolutional
geometry/attribute compression models with learned entropy models feeding a
host-side C++ rANS coder, driven by a YAML+dotlist config harness.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):
  runtime/        C++ rANS coder + CDF quantization (host, ctypes)
  ops/            Morton codes, sparse voxel grids, sparse conv (XLA/Pallas)
  nn/             functional NN building blocks (flax.linen)
  entropy_models/ distributions + batched/indexed/hyperprior entropy models
  data/           PCData, datasets, kd-tree partition, collate
  models/         model packages, each exporting Model and Config
  parallel/       mesh / data-parallel training utilities
  metrics/        pc_error wrapper, BD-rate, evaluator
  config/         SimpleConfig dataclass-config system
"""

__version__ = "0.1.0"

# Morton codes need 64-bit integers; all float dtypes in this package are
# explicit (float32/bfloat16), so enabling x64 only widens the int path.
import os as _os  # noqa: E402

# MUST precede any jax/XLA initialization: merges --xla_disable_hlo_passes
# for libtpu passes that SIGABRT on this rig's compiler (see module docs).
# Loaded by file path so the utils package __init__ (which imports jax)
# does not run first.
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    'fastpcc_tpu.utils.xla_workarounds',
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                  'utils', 'xla_workarounds.py'))
_xla_workarounds = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_xla_workarounds)
_xla_workarounds.apply()

import jax as _jax  # noqa: E402

_jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: per-scale step functions of the coders are
# many small programs; caching them makes warm starts near-instant.
_cache_dir = _os.environ.get(
    'FASTPCC_JAX_CACHE',
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                  'build', 'jax_cache'))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update('jax_compilation_cache_dir', _cache_dir)
    _jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    _jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

