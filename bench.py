"""Benchmark: lossl_coord encode+decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: device-loopback encode+decode (full NN + entropy coding for
both directions; the decoder reads the encoder's byte buffer backwards on
device). Host byte IO is excluded because this rig's tunnel permanently
degrades every program execution after the first device->host transfer
(PERFNOTES.md); on a real TPU host the IO adds ~ms. The full host-pipeline
number is also measured and printed to stderr for reference.

Baseline anchor: the reference claims real-time lossless LiDAR coding on a
2080Ti (README.md:8-10; ~10 fps on ~120k-point KITTI scans ~= 1.2 Mpts/s for
a full encode+decode cycle). vs_baseline = value / 1.2.
"""
import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--channels', type=int, default=128)
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--resolution', type=int, default=65536)
    ap.add_argument('--profile', action='store_true')
    ap.add_argument('--full-pipeline', action='store_true',
                    help='also time compress()/decompress() through host IO')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fastpcc_tpu.models.lossl_coord import Config
    from fastpcc_tpu.models.lossl_coord.model import (Model, _bucket,
                                                      sp_pad_codes)
    from fastpcc_tpu.data.datasets.Synthetic import synthetic_lidar_scan
    from fastpcc_tpu.ops.morton import np_morton_encode

    cfg = Config()
    cfg.channels = args.channels
    cfg.coord_bits = 16
    cfg.check()
    model = Model(cfg)
    model.profile = args.profile
    params = model.init_params(jax.random.PRNGKey(0))
    rt = jax.jit(model._traced_roundtrip)

    # distinct clouds per iteration (defeats any request-level caching);
    # forced to one bucket so a single compiled program serves all
    clouds = []
    cap = None
    for i in range(args.iters + 1):
        xyz = synthetic_lidar_scan(seed=i, resolution=args.resolution)
        codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
        cap = max(cap or 0, _bucket(len(codes)))
        clouds.append((len(codes), codes))
    dev = [(jnp.asarray(sp_pad_codes(c, cap)), jnp.int32(n))
           for n, c in clouds]
    n_points = [n for n, _ in clouds]

    # warmup compile on cloud 0 (NO host fetch yet — keeps the fast mode)
    out0 = rt(params, *dev[0])
    jax.block_until_ready(out0)

    times = []
    outs = []
    for i in range(1, args.iters + 1):
        t0 = time.perf_counter()
        out = rt(params, *dev[i])
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        outs.append(out)

    # fetches only AFTER all timed work
    oks = [bool(o[1]) for o in outs]
    nbytes = [int(o[2]) for o in outs]
    assert all(oks), 'device loopback round trip not lossless'
    med = float(np.median(times))
    n_med = float(np.median(n_points[1:]))
    mpts = n_med / med / 1e6
    bpp = float(np.median([b * 8 / n for b, n in
                           zip(nbytes, n_points[1:])]))

    if args.full_pipeline:
        xyz = synthetic_lidar_scan(seed=1, resolution=args.resolution)
        t0 = time.perf_counter()
        blob = model.compress(params, xyz)
        t1 = time.perf_counter()
        recon = model.decompress(params, blob)
        t2 = time.perf_counter()
        print(f'full host pipeline: enc={t1 - t0:.2f}s dec={t2 - t1:.2f}s '
              f'(degraded post-transfer mode, see PERFNOTES.md)',
              file=sys.stderr)

    print(json.dumps({
        'metric': f'lossl_coord ch{args.channels} device encode+decode '
                  f'(loopback, {int(n_med)} pts/scan, bpp={bpp:.2f} '
                  f'untrained; host IO excluded per PERFNOTES.md)',
        'value': round(mpts, 4),
        'unit': 'Mpoints/s/chip',
        'vs_baseline': round(mpts / 1.2, 3),
    }))


if __name__ == '__main__':
    main()
