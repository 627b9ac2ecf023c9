"""Device-trace bench for the lossy model families (v1/v2/v3/color).

Complements bench.py (flagship lossl_coord): one JSON line PER MODEL with
the device encode+decode time of a whole-frame compress->decompress cycle
on a dense synthetic surface cloud (8iVFBv2-style density — the clouds the
reference evaluates the lossy families on). Same methodology as bench.py:
XLA-module device
durations from a jax.profiler trace (wall clock is meaningless on this rig,
see PERFNOTES.md). The reference anchor stays the 2080Ti real-time claim
(~1.2 Mpts/s, reference: README.md:8-10).

Usage: python scripts/bench_models.py [--models v2,v3,color,v1] [--iters 2]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(name, iters, resolution, points):
    import numpy as np
    import jax

    from fastpcc_tpu.data.datasets.Synthetic import synthetic_surface
    from bench import device_module_ms

    rng = np.random.default_rng(0)
    # Dense solid-surface clouds (8iVFBv2-style density): the lossy
    # families are solid-voxel codecs — the reference evaluates them on
    # dense CTC clouds, not LiDAR scans (a 65536-res scan overflows v2's
    # geo_cap_shrink capacity plan because generative upsampling assumes
    # solid occupancy; reference: lossy_coord_v2 configs target 8iVFBv2).
    scans = [synthetic_surface(seed=i, n=points, resolution=resolution)
             for i in range(iters + 1)]
    colors = [rng.integers(0, 256, (len(s), 3)).astype(np.uint8)
              for s in scans]

    if name == 'v1':
        from fastpcc_tpu.models.lossy_coord import Config
        from fastpcc_tpu.models.lossy_coord.model import Model
        cfg = Config()
    elif name == 'v2':
        from fastpcc_tpu.models.lossy_coord_v2 import Config
        from fastpcc_tpu.models.lossy_coord_v2.model import Model
        cfg = Config()
    elif name == 'v3':
        from fastpcc_tpu.models.lossy_coord_v3 import Config
        from fastpcc_tpu.models.lossy_coord_v3.model import Model
        cfg = Config()
    elif name == 'color':
        from fastpcc_tpu.models.lossy_coord_lossy_color import Config
        from fastpcc_tpu.models.lossy_coord_lossy_color.model import Model
        cfg = Config()
    else:
        raise SystemExit(f'unknown model {name}')
    import math
    cfg.coord_bits = max(int(math.ceil(math.log2(resolution))), 8)
    if hasattr(cfg, 'geo_cap_shrink_log2'):
        # generous static caps: the geo ladder only downsamples on
        # if_sample steps, so per-step cap halving overflows on clouds
        # whose counts shrink slower than the step index (same setting the
        # v2/color unit tests use); costs padded rows, never correctness
        cfg.geo_cap_shrink_log2 = 0
    cfg.check()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    def cycle(i):
        if name == 'color':
            blob = model.compress(params, scans[i], colors[i])
            out = model.decompress(params, blob)
            recon = out[0] if isinstance(out, tuple) else out
        else:
            blob = model.compress(params, scans[i])
            recon = model.decompress(params, blob)
        return blob, recon

    blob0, _ = cycle(0)                    # compile + warm
    time.sleep(1)

    logdir = f'/tmp/bm_trace_{time.time_ns()}'
    with jax.profiler.trace(logdir):
        blobs = [cycle(i)[0] for i in range(1, iters + 1)]
    total_ms, n_exec = device_module_ms(logdir)
    os.system(f'rm -rf {logdir}')

    n_pts = [len(scans[i]) for i in range(1, iters + 1)]
    if n_exec == 0:                        # CPU fallback: wall clock
        t0 = time.perf_counter()
        cycle(1)
        total_ms, n_iter = (time.perf_counter() - t0) * 1e3, 1
    else:
        n_iter = iters
    ms = total_ms / n_iter                 # device ms per full cycle
    n_med = float(np.median(n_pts))
    bpp = float(np.median([len(b) * 8 / n for b, n in zip(blobs, n_pts)])) \
        if n_exec else 0.0
    print(json.dumps({
        'model': f'lossy_coord_{name}' if name != 'color'
                 else 'lossy_coord_lossy_color',
        'device_ms_per_frame': round(ms, 2),
        'value': round(n_med / ms / 1000.0, 4),
        'unit': 'Mpoints/s/chip',
        'points': int(n_med),
        'bpp_untrained': round(bpp, 3),
        'vs_baseline': round(n_med / ms / 1000.0 / 1.2, 3),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--models', default='v1,v2,v3,color')
    ap.add_argument('--iters', type=int, default=2)
    ap.add_argument('--resolution', type=int, default=1024)
    ap.add_argument('--points', type=int, default=200_000)
    ap.add_argument('--fast-conv', type=int, default=0,
                    help='route every sparse conv cond-free (windowed '
                         'Pallas kernel where shapes allow, exact 27-tap '
                         'otherwise): kills the ~11 ms/conv lax.cond '
                         'operand staging the round-5 flagship attribution '
                         'found. Encoder and decoder trace the same flag, '
                         'so streams stay self-consistent; the windowed '
                         'far-truncation only shifts the (untrained) '
                         'operating point slightly.')
    args = ap.parse_args()
    if args.fast_conv:
        from fastpcc_tpu.ops.sparse import set_fast_conv
        set_fast_conv(True)
    for name in args.models.split(','):
        run_one(name.strip(), args.iters, args.resolution, args.points)


if __name__ == '__main__':
    main()
