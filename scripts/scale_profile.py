"""Per-scale / per-category attribution of the flagship roundtrip's device
time.

Runs the jitted whole-frame roundtrip under a profiler trace and aggregates
the 'XLA Ops' line by (a) the named_scope scale tag (`scaleN`, emitted by
Model._run_scales) found in each op's display_name, and (b) HLO op category
(fusion / convolution / sort / while / copy / ...). This is the instrument
for attacking the "misc fusion tail" (PERFNOTES.md round-2 budget).

Usage: python scripts/scale_profile.py [--channels 128] [--resolution 65536]
       [--batch 1] [--fast-conv 1] [--dump-names 0]
"""
import argparse
import collections
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--channels', type=int, default=128)
    ap.add_argument('--resolution', type=int, default=65536)
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--fast-conv', type=int, default=0)
    ap.add_argument('--dump-names', type=int, default=0,
                    help='print N sample (name, display) pairs to inspect '
                         'what scope metadata this runtime emits')
    ap.add_argument('--top-ops', type=int, default=30,
                    help='print the N individually most expensive ops '
                         '(aggregated by op name across executions)')
    ap.add_argument('--cat', type=str, default='',
                    help='restrict the top-ops listing to one HLO category '
                         '(e.g. fusion) and print full op text')
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from fastpcc_tpu.ops.sparse import set_fast_conv
    set_fast_conv(bool(args.fast_conv))
    from fastpcc_tpu.models.lossl_coord import Config
    from fastpcc_tpu.models.lossl_coord.model import (Model, _bucket,
                                                      sp_pad_codes)
    from fastpcc_tpu.data.datasets.Synthetic import synthetic_lidar_scan
    from fastpcc_tpu.ops.morton import np_morton_encode
    from fastpcc_tpu.utils.xplane import parse_xplane

    cfg = Config()
    cfg.channels = args.channels
    cfg.coord_bits = 16
    cfg.check()
    model = Model(cfg)
    model.batch_hint = args.batch
    params = model.init_params(jax.random.PRNGKey(0))
    rt = model.split_roundtrip()

    parts = []
    for b in range(args.batch):
        xyz = synthetic_lidar_scan(seed=b, resolution=args.resolution)
        c = np.unique(np_morton_encode(xyz.astype(np.int64)))
        parts.append(c | (np.int64(b) << (3 * cfg.coord_bits)))
    codes_np = np.sort(np.concatenate(parts))
    cap = _bucket(len(codes_np))
    caps, fast_mask = model._scale_plan(codes_np, cap)
    if not args.fast_conv:
        fast_mask = 0
    dev = (jnp.asarray(sp_pad_codes(codes_np, cap)),
           jnp.int32(len(codes_np)), caps, fast_mask)

    out = rt(params, *dev)
    jax.block_until_ready(out)
    assert bool(out[1]), 'loopback not lossless'
    time.sleep(1)

    logdir = f'/tmp/sp_trace_{time.time_ns()}'
    with jax.profiler.trace(logdir):
        o = rt(params, *dev)
        jax.block_until_ready(o)

    by_scale = collections.Counter()
    by_cat = collections.Counter()
    by_scale_cat = collections.Counter()
    by_op = collections.Counter()
    by_module = collections.Counter()
    op_disp = {}
    total_ops = 0.0
    module_ms = 0.0
    samples = []
    scale_re = re.compile(r'scale(\d+)')
    for path in glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                          recursive=True):
        for pname, evs in parse_xplane(path, with_display=True).items():
            if 'TPU' not in pname:
                continue
            for line, name, dur, disp in evs:
                if line == 'XLA Modules':
                    module_ms += dur / 1e9
                    by_module[re.split(r'[.(]', name, 1)[0]] += dur / 1e9
                    continue
                if line != 'XLA Ops':
                    continue
                ms = dur / 1e9
                total_ops += ms
                cat = re.split(r'[.\d]', name, 1)[0] or name
                by_cat[cat] += ms
                by_op[name] += ms
                if name not in op_disp and disp:
                    op_disp[name] = disp[:400]
                m = scale_re.search(disp or '')
                tag = f'scale{m.group(1)}' if m else '(unscoped)'
                by_scale[tag] += ms
                by_scale_cat[(tag, cat)] += ms
                if args.dump_names and len(samples) < args.dump_names:
                    samples.append((name, disp, round(ms, 3)))
    os.system(f'rm -rf {logdir}')

    print(f'module total: {module_ms:.1f} ms   ops total: {total_ops:.1f} ms')
    print('\n-- by module (encode/decode split) --')
    for name, ms in by_module.most_common(8):
        print(f'{name:40} {ms:9.1f} ms')
    print('\n-- by scale --')
    for tag, ms in by_scale.most_common():
        print(f'{tag:12} {ms:9.1f} ms')
    print('\n-- by category --')
    for cat, ms in by_cat.most_common(15):
        print(f'{cat:24} {ms:9.1f} ms')
    print('\n-- top scale x category --')
    for (tag, cat), ms in by_scale_cat.most_common(25):
        print(f'{tag:12} {cat:24} {ms:9.1f} ms')
    if args.top_ops:
        print('\n-- top individual ops --')
        shown = 0
        for name, ms in by_op.most_common():
            cat = re.split(r'[.\d]', name, 1)[0] or name
            if args.cat and args.cat not in cat:
                continue
            disp = op_disp.get(name, '')
            print(f'{ms:9.2f} ms  {name:40}  '
                  f'{disp if args.cat else disp[:160]}')
            shown += 1
            if shown >= args.top_ops:
                break
    for s in samples:
        print('SAMPLE', s)


if __name__ == '__main__':
    main()
