"""Cross-backend determinism proof for lossl_coord_int.

The int path exists to make encode/decode bit-identical across platforms
(reference: README.md:10,142 — their guarantee is CPU-vs-GPU; ours is
CPU-vs-TPU). This script runs on a rig with BOTH backends available:

  * converts a float flagship (multi-step-chain topology) to int,
  * compresses the same cloud with the TPU backend and the CPU backend,
  * asserts the two bitstreams are BYTE-IDENTICAL,
  * decodes the TPU-encoded stream on CPU (and vice versa), asserting
    losslessness.

Usage: python scripts/cross_backend_check.py  (needs a TPU; exits 0 on pass)
"""
import sys

import numpy as np
import jax

sys.path.insert(0, '.')

from fastpcc_tpu.models.lossl_coord import Config                  # noqa: E402
from fastpcc_tpu.models.lossl_coord.model import Model as FloatModel  # noqa: E402
from fastpcc_tpu.models.lossl_coord_int import Model as IntModel   # noqa: E402


def _cloud(n, res, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = res * 0.4 * (1 + 0.05 * rng.normal(size=(n, 1)))
    return np.unique(np.clip(v * r + res / 2, 0, res - 1).astype(np.int32),
                     axis=0)


def main():
    try:
        tpu = jax.devices('tpu')[0]
    except RuntimeError:
        try:
            tpu = jax.devices('axon')[0]
        except RuntimeError:
            print('SKIP: no TPU backend available')
            return 0
    cpu = jax.devices('cpu')[0]

    cfg = Config()
    cfg.channels = 16
    cfg.max_stride = 128
    cfg.max_stride_wo_recurrent = 64
    cfg.fea_stride = 16          # multi-step chains, the shipped topology
    cfg.coord_bits = 8
    cfg.coder_lanes = 8
    cfg.check()

    fm = FloatModel(cfg)
    params = fm.init_params(jax.random.PRNGKey(0))
    calib = [_cloud(500, 256, seed=9)]
    with jax.default_device(cpu):
        _, iparams = IntModel.from_float(fm, params, calib)
    xyz = _cloud(800, 256, seed=1)

    with jax.default_device(tpu):
        m_tpu = IntModel(cfg)
        blob_tpu = m_tpu.compress(iparams, xyz)
    with jax.default_device(cpu):
        m_cpu = IntModel(cfg)
        blob_cpu = m_cpu.compress(iparams, xyz)

    assert blob_tpu == blob_cpu, (
        f'STREAM MISMATCH: tpu {len(blob_tpu)}B vs cpu {len(blob_cpu)}B')
    print(f'byte-identical streams: {len(blob_tpu)} bytes')

    def _check(recon):
        a = recon[np.lexsort(recon.T[::-1])]
        b = xyz[np.lexsort(xyz.T[::-1])]
        np.testing.assert_array_equal(a, b)

    with jax.default_device(cpu):
        _check(m_cpu.decompress(iparams, blob_tpu))
    print('TPU-encoded stream decodes losslessly on CPU')
    with jax.default_device(tpu):
        _check(m_tpu.decompress(iparams, blob_cpu))
    print('CPU-encoded stream decodes losslessly on TPU')
    print('PASS: cross-backend determinism holds')
    return 0


if __name__ == '__main__':
    sys.exit(main())
