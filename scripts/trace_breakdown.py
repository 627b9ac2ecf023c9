"""Per-op device-time breakdown of the flagship whole-frame roundtrip.

Aggregates XLA-op device durations from a jax.profiler trace: by category
(fusion/while/copy/sort/dot/...) and top individual ops. The working
instrument of the round-3 perf campaign (wall clock is meaningless on this
rig, see PERFNOTES.md).

Usage: python scripts/trace_breakdown.py [--channels 128] [--top 40]
"""
import argparse
import collections
import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect(logdir):
    from fastpcc_tpu.utils.xplane import parse_xplane
    per_op = collections.Counter()
    per_op_n = collections.Counter()
    modules = []
    for path in glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                          recursive=True):
        for pname, evs in parse_xplane(path).items():
            if 'TPU' not in pname:
                continue
            for line, name, dur in evs:
                if line == 'XLA Modules':
                    modules.append(dur / 1e9)
                elif line == 'XLA Ops':
                    per_op[name] += dur / 1e9
                    per_op_n[name] += 1
    return modules, per_op, per_op_n


CATS = [
    ('while', re.compile(r'^while')),
    ('dot/conv', re.compile(r'^(dot|convolution)')),
    ('sort', re.compile(r'^sort')),
    ('copy', re.compile(r'^(copy|bitcast|transpose)')),
    ('dynamic-slice/update', re.compile(r'^dynamic')),
    ('scatter', re.compile(r'scatter')),
    ('gather', re.compile(r'^gather')),
    ('pad/concat/reshape', re.compile(r'^(pad|concatenate|reshape|slice)')),
    ('custom(pallas)', re.compile(r'^custom-call')),
    ('fusion', re.compile(r'^(fusion|loop_|input_|output_)')),
]


def categorize(name):
    name = name.lstrip('%')
    for cat, rx in CATS:
        if rx.search(name):
            return cat
    return 'other'


def shape_sig(name):
    """Group ops by opcode + result shape, e.g. 'fusion bf16[8388608,8]'."""
    name = name.lstrip('%')
    m = re.match(r'([a-z_\-]+)[.\d]* = ([a-z0-9]+)\[([\d,]*)\]', name)
    if not m:
        return name.split(' ')[0]
    return f'{m.group(1)} {m.group(2)}[{m.group(3)}]'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--channels', type=int, default=128)
    ap.add_argument('--resolution', type=int, default=65536)
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--iters', type=int, default=1)
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
    rt = model.split_roundtrip()

    xyz = synthetic_lidar_scan(seed=1, resolution=args.resolution)
    codes_np = np.unique(np_morton_encode(xyz.astype(np.int64)))
    cap = _bucket(len(codes_np))
    caps = model._scale_caps(codes_np, cap)
    codes = jnp.asarray(sp_pad_codes(codes_np, cap))
    count = jnp.int32(len(codes_np))
    print(f'n={len(codes_np)} cap={cap} caps={caps}', flush=True)

    t0 = time.time()
    out = rt(params, codes, count, caps)
    jax.block_until_ready(out)
    print(f'compile+warm {time.time()-t0:.1f}s', flush=True)
    time.sleep(1)

    logdir = f'/tmp/tb_trace_{time.time_ns()}'
    with jax.profiler.trace(logdir):
        outs = [rt(params, codes, count, caps) for _ in range(args.iters)]
        jax.block_until_ready(outs)
    assert bool(outs[0][1]), 'not lossless'

    modules, per_op, per_op_n = collect(logdir)
    os.system(f'rm -rf {logdir}')
    n_exec = len(modules)
    total = sum(modules)
    print(f'\nmodule execs: {n_exec}, total {total:.1f} ms, '
          f'per exec {total/max(n_exec,1):.1f} ms')

    import json
    dump = {'modules_ms': modules,
            'ops': [[name, d, per_op_n[name]]
                    for name, d in per_op.most_common()]}
    with open('/tmp/trace_ops.json', 'w') as f:
        json.dump(dump, f)
    print('raw per-op dump -> /tmp/trace_ops.json')

    cats = collections.Counter()
    for name, d in per_op.items():
        cats[categorize(name)] += d
    print('\n-- by category (ms, per exec) --')
    for cat, d in cats.most_common():
        print(f'{d/max(n_exec,1):9.2f}  {cat}')

    sigs = collections.Counter()
    sign = collections.Counter()
    for name, d in per_op.items():
        s = shape_sig(name)
        sigs[s] += d
        sign[s] += per_op_n[name]
    print(f'\n-- top {args.top} shape-classes (ms per exec, count) --')
    for s, d in sigs.most_common(args.top):
        print(f'{d/max(n_exec,1):9.2f}  x{sign[s]:<5d} {s}')

    print(f'\n-- top {args.top} ops (ms per exec, count) --')
    for name, d in per_op.most_common(args.top):
        print(f'{d/max(n_exec,1):9.2f}  x{per_op_n[name]:<5d} {name[:110]}')


if __name__ == '__main__':
    main()
