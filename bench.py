"""Benchmark: lossl_coord encode+decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline anchor: the reference claims real-time lossless LiDAR coding on a
2080Ti (README.md:8-10; ~10 fps on ~120k-point KITTI scans ≈ 1.2 Mpts/s for
a full encode+decode cycle). vs_baseline = value / 1.2.
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--channels', type=int, default=128)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--resolution', type=int, default=65536)
    ap.add_argument('--profile', action='store_true')
    args = ap.parse_args()

    import jax
    from fastpcc_tpu.models.lossl_coord import Config
    from fastpcc_tpu.models.lossl_coord.model import Model
    from fastpcc_tpu.data.datasets.Synthetic import synthetic_lidar_scan

    cfg = Config()
    cfg.channels = args.channels
    cfg.coord_bits = 16
    cfg.check()
    model = Model(cfg)
    model.profile = args.profile
    params = model.init_params(jax.random.PRNGKey(0))

    xyz = synthetic_lidar_scan(seed=0, resolution=args.resolution)
    n = len(xyz)

    # warmup (compiles all per-scale steps; lossless check)
    blob = model.compress(params, xyz)
    recon = model.decompress(params, blob)
    a = recon[np.lexsort(recon.T[::-1])]
    b = xyz[np.lexsort(xyz.T[::-1])]
    assert np.array_equal(a, b), 'lossless round trip failed'
    model.last_profile = {}  # drop warmup-compile time from the profile

    enc_times, dec_times = [], []
    for i in range(args.iters):
        t0 = time.perf_counter()
        blob = model.compress(params, xyz)
        t1 = time.perf_counter()
        model.decompress(params, blob)
        t2 = time.perf_counter()
        enc_times.append(t1 - t0)
        dec_times.append(t2 - t1)

    enc = float(np.median(enc_times))
    dec = float(np.median(dec_times))
    mpts = n / (enc + dec) / 1e6
    if args.profile:
        import sys
        prof = {k: round(v / args.iters, 3)
                for k, v in model.last_profile.items()}
        print(f'enc={enc:.2f}s dec={dec:.2f}s profile/iter: {prof}',
              file=sys.stderr)
    print(json.dumps({
        'metric': f'lossl_coord ch{args.channels} encode+decode throughput '
                  f'(synthetic KITTI-like scan, {n} pts, '
                  f'bpp={len(blob) * 8 / n:.2f} untrained)',
        'value': round(mpts, 4),
        'unit': 'Mpoints/s/chip',
        'vs_baseline': round(mpts / 1.2, 3),
    }))


if __name__ == '__main__':
    main()
