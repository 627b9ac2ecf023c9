"""Cross-backend (TPU<->CPU) determinism of the integer path.

The reference's int model exists to guarantee platform-independent decode
(reference: README.md:10,142). The actual proof needs two real backends, so
it runs as a subprocess OUTSIDE this suite's CPU sandbox
(scripts/cross_backend_int_check.py); here we launch it when a TPU is
attached and assert every check passed.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_attached():
    """Probe for a TPU without poisoning this process's CPU-only jax."""
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'XLA_FLAGS')}
    r = subprocess.run(
        [sys.executable, '-c',
         'import jax; print(len(jax.devices("tpu")))'],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    return r.returncode == 0 and r.stdout.strip().isdigit() \
        and int(r.stdout.strip()) > 0


@pytest.mark.slow
def test_int_stream_byte_identical_across_backends():
    if not _tpu_attached():
        pytest.skip('no TPU attached: cross-backend proof needs two real '
                    'backends')
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'XLA_FLAGS')}
    r = subprocess.run(
        [sys.executable, 'scripts/cross_backend_int_check.py'],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert r.returncode == 0, f'stdout={r.stdout}\nstderr={r.stderr[-2000:]}'
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res['encode_streams_byte_identical']
    assert res['tpu_stream_decodes_lossless_on_cpu']
    assert res['cpu_stream_decodes_lossless_on_tpu']
