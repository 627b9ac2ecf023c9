"""Cross-backend determinism proof for lossl_coord_int.

The integer path EXISTS to make encode/decode bit-identical across
platforms (reference: README.md:10,142 — float nondeterminism across
GPUs/CPUs desynchronizes entropy decoding; the int model removes it).
This script proves the property on real hardware: the SAME integer
parameter tree drives

  * encode on the TPU backend and encode on the CPU backend
    -> byte-identical bitstreams, and
  * decode of the TPU-encoded stream on CPU (and the CPU-encoded
    stream on TPU) -> exact reconstruction.

Run OUTSIDE the test suite's CPU sandbox (needs the real TPU):

    python scripts/cross_backend_int_check.py [--flagship-topology]

Prints one JSON line; exit 0 iff every check passed.
tests/test_cross_backend.py wraps this as a subprocess (skipped when no
TPU is attached).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_cloud(n, res, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = res * 0.4 * (1 + 0.05 * rng.normal(size=(n, 1)))
    return np.unique(np.clip(v * r + res / 2, 0, res - 1).astype(np.int32),
                     axis=0)


def sort_rows(a):
    return a[np.lexsort(a.T[::-1])]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--flagship-topology', action='store_true',
                    help='fea_stride=16 multi-step chains (slower compile)')
    ap.add_argument('--points', type=int, default=700)
    args = ap.parse_args()

    import jax
    from fastpcc_tpu.models.lossl_coord import Config
    from fastpcc_tpu.models.lossl_coord.model import Model as FloatModel
    from fastpcc_tpu.models.lossl_coord_int import Model as IntModel

    try:
        tpu = jax.devices('tpu')[0]
    except RuntimeError:
        print(json.dumps({'ok': False, 'reason': 'no TPU backend attached'}))
        return 2
    cpu = jax.devices('cpu')[0]

    cfg = Config()
    cfg.channels = 16
    cfg.coord_bits = 8
    cfg.coder_lanes = 8
    if args.flagship_topology:
        cfg.max_stride = 128
        cfg.max_stride_wo_recurrent = 64
        cfg.fea_stride = 16        # MS chains k=4,3,2 (shipped flagship)
    else:
        cfg.max_stride = 64
        cfg.max_stride_wo_recurrent = 16
        cfg.fea_stride = 2         # OSP ladder
    cfg.check()

    fm = FloatModel(cfg)
    params = fm.init_params(jax.random.PRNGKey(0))
    calib = [make_cloud(500, 256, seed=9)]
    _, iparams = IntModel.from_float(fm, params, calib)
    xyz = make_cloud(args.points, 256, seed=1)

    # independent Model instances per backend: no shared jit caches
    enc_tpu, enc_cpu = IntModel(cfg), IntModel(cfg)
    dec_tpu, dec_cpu = IntModel(cfg), IntModel(cfg)

    with jax.default_device(tpu):
        blob_tpu = enc_tpu.compress(iparams, xyz)
    with jax.default_device(cpu):
        blob_cpu = enc_cpu.compress(iparams, xyz)
    enc_match = blob_tpu == blob_cpu

    with jax.default_device(cpu):
        recon_on_cpu = dec_cpu.decompress(iparams, blob_tpu)
    with jax.default_device(tpu):
        recon_on_tpu = dec_tpu.decompress(iparams, blob_cpu)
    ref = sort_rows(xyz)
    cpu_lossless = (recon_on_cpu.shape == xyz.shape
                    and bool(np.array_equal(sort_rows(recon_on_cpu), ref)))
    tpu_lossless = (recon_on_tpu.shape == xyz.shape
                    and bool(np.array_equal(sort_rows(recon_on_tpu), ref)))

    ok = enc_match and cpu_lossless and tpu_lossless
    print(json.dumps({
        'ok': bool(ok),
        'topology': 'ms_chains' if args.flagship_topology else 'osp_ladder',
        'points': int(len(xyz)),
        'stream_bytes': len(blob_tpu),
        'encode_streams_byte_identical': bool(enc_match),
        'tpu_stream_decodes_lossless_on_cpu': cpu_lossless,
        'cpu_stream_decodes_lossless_on_tpu': tpu_lossless,
    }))
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
