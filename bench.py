"""Benchmark: lossl_coord encode+decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing methodology (round 2): this rig's IFRT-proxy runtime resolves
block_until_ready BEFORE the device finishes, so wall-clock dispatch timing
is meaningless (PERFNOTES.md). The metric is the DEVICE execution time of
the whole-frame roundtrip program (full NN + entropy coding both directions,
decoder reads the encoder's word buffer on device), read from a
jax.profiler trace (XLA-module durations, fastpcc_tpu/utils/xplane.py).

Baseline anchor: the reference claims real-time lossless LiDAR coding on a
2080Ti (README.md:8-10; ~10 fps on ~120k-point KITTI scans ~= 1.2 Mpts/s for
a full encode+decode cycle). vs_baseline = value / 1.2.
"""
import argparse
import glob
import json
import os
import sys
import time


def device_module_ms(logdir: str):
    from fastpcc_tpu.utils.xplane import parse_xplane
    total, count = 0.0, 0
    for path in glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                          recursive=True):
        for pname, evs in parse_xplane(path).items():
            if 'TPU' not in pname:
                continue
            for line, name, dur in evs:
                if line == 'XLA Modules':
                    total += dur / 1e9
                    count += 1
    return total, count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--channels', type=int, default=128)
    ap.add_argument('--iters', type=int, default=2)
    ap.add_argument('--resolution', type=int, default=65536)
    args = ap.parse_args()

    import numpy as np
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
    params = model.init_params(jax.random.PRNGKey(0))
    rt = jax.jit(model._traced_roundtrip, static_argnums=(3,))

    clouds = []
    cap = 0
    for i in range(args.iters + 1):
        xyz = synthetic_lidar_scan(seed=i, resolution=args.resolution)
        codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
        cap = max(cap, _bucket(len(codes)))
        clouds.append(codes)
    # shared static per-scale caps across the bench clouds (compile once)
    caps_list = [model._scale_caps(c, cap) for c in clouds]
    caps = tuple(max(cs[s] for cs in caps_list)
                 for s in range(len(caps_list[0])))
    dev = [(jnp.asarray(sp_pad_codes(c, cap)), jnp.int32(len(c)), caps)
           for c in clouds]
    n_points = [len(c) for c in clouds]

    out0 = rt(params, *dev[0])            # compile + warm
    jax.block_until_ready(out0)
    time.sleep(1)

    logdir = f'/tmp/bench_trace_{time.time_ns()}'
    with jax.profiler.trace(logdir):
        outs = [rt(params, *dev[i]) for i in range(1, args.iters + 1)]
        jax.block_until_ready(outs)
        # trace stop blocks until the device drains the queue
    oks = [bool(o[1]) for o in outs]
    nbytes = [int(o[2]) for o in outs]
    assert all(oks), 'device loopback round trip not lossless'

    total_ms, n_exec = device_module_ms(logdir)
    os.system(f'rm -rf {logdir}')
    if n_exec == 0:   # no trace (e.g. CPU run): fall back to wall clock
        t0 = time.perf_counter()
        o = rt(params, *dev[1])
        jax.block_until_ready(o)
        float(jnp.asarray(o[2]))          # force real completion via fetch
        total_ms, n_exec = (time.perf_counter() - t0) * 1e3, 1
    ms = total_ms / n_exec
    n_med = float(np.median(n_points[1:]))
    mpts = n_med / ms / 1000.0
    bpp = float(np.median([b * 8 / n for b, n in zip(nbytes, n_points[1:])]))

    print(json.dumps({
        'metric': f'lossl_coord ch{args.channels} device encode+decode '
                  f'(device-trace time, {int(n_med)} pts/scan, '
                  f'bpp={bpp:.2f} untrained)',
        'value': round(mpts, 4),
        'unit': 'Mpoints/s/chip',
        'vs_baseline': round(mpts / 1.2, 3),
    }))


if __name__ == '__main__':
    main()
