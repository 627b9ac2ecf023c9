"""Whole-frame flagship roundtrip: REAL device time via profiler trace."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from micro_profile import trace_ms


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fastpcc_tpu.models.lossl_coord import Config
    from fastpcc_tpu.models.lossl_coord.model import Model, _bucket, sp_pad_codes
    from fastpcc_tpu.data.datasets.Synthetic import synthetic_lidar_scan
    from fastpcc_tpu.ops.morton import np_morton_encode

    cfg = Config()
    cfg.channels = int(os.environ.get('BENCH_CH', '128'))
    cfg.coord_bits = 16
    cfg.check()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rt = model.split_roundtrip()

    xyz = synthetic_lidar_scan(seed=1, resolution=65536)
    codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
    cap = _bucket(len(codes))
    caps = model._scale_caps(codes, cap)
    dev = (jnp.asarray(sp_pad_codes(codes, cap)), jnp.int32(len(codes)), caps)
    n = len(codes)
    ms, c = trace_ms(rt, params, *dev, iters=2)
    print(f'roundtrip {n} pts ch{cfg.channels}: {ms:.1f} ms/exec ({c} execs) '
          f'-> {n / ms / 1000:.3f} Mpts/s encode+decode')
    out = rt(params, *dev)
    print('lossless:', bool(out[1]))


if __name__ == '__main__' and len(sys.argv) == 1:
    main()

def breakdown():
    """Aggregate device op kinds for the flagship roundtrip trace."""
    import numpy as np, re, glob, time
    import jax, jax.numpy as jnp
    from fastpcc_tpu.models.lossl_coord import Config
    from fastpcc_tpu.models.lossl_coord.model import Model, _bucket, sp_pad_codes
    from fastpcc_tpu.data.datasets.Synthetic import synthetic_lidar_scan
    from fastpcc_tpu.ops.morton import np_morton_encode
    from fastpcc_tpu.utils.xplane import parse_xplane
    cfg = Config(); cfg.channels = int(os.environ.get('BENCH_CH', '128'))
    cfg.coord_bits = 16; cfg.check()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rt = model.split_roundtrip()
    xyz = synthetic_lidar_scan(seed=1, resolution=65536)
    codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
    cap = _bucket(len(codes))
    dev = (jnp.asarray(sp_pad_codes(codes, cap)), jnp.int32(len(codes)))
    out = rt(params, *dev); jax.block_until_ready(out); time.sleep(1)
    logdir = f'/tmp/rt_breakdown_{time.time_ns()}'
    with jax.profiler.trace(logdir):
        out = rt(params, *dev)
        jax.block_until_ready(out)
    agg = {}
    for path in glob.glob(os.path.join(logdir, '**', '*.xplane.pb'), recursive=True):
        for pname, evs in parse_xplane(path).items():
            if 'TPU' not in pname: continue
            for line, name, dur in evs:
                if line != 'XLA Ops': continue
                m = re.match(r'%?([a-zA-Z\-_\.0-9]+) ', name) or re.match(r'%?([a-zA-Z\-_]+)', name)
                k = re.match(r'%?([a-zA-Z\-_]+)', name).group(1)
                agg.setdefault(k, [0, 0.0]); agg[k][0] += 1; agg[k][1] += dur/1e9
    for k, (c, t) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:14]:
        print(f'{t:9.1f} ms  n={c:6d}  {k}')
    os.system(f'rm -rf {logdir}')

if __name__ == '__main__' and len(sys.argv) > 1 and sys.argv[1] == 'breakdown':
    breakdown()

def topops():
    """Top individual XLA ops by total device time (full names)."""
    import numpy as np, glob, time
    import jax, jax.numpy as jnp
    from fastpcc_tpu.models.lossl_coord import Config
    from fastpcc_tpu.models.lossl_coord.model import Model, _bucket, sp_pad_codes
    from fastpcc_tpu.data.datasets.Synthetic import synthetic_lidar_scan
    from fastpcc_tpu.ops.morton import np_morton_encode
    from fastpcc_tpu.utils.xplane import parse_xplane
    cfg = Config(); cfg.channels = int(os.environ.get('BENCH_CH', '128'))
    cfg.coord_bits = 16; cfg.check()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rt = model.split_roundtrip()
    xyz = synthetic_lidar_scan(seed=1, resolution=65536)
    codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
    cap = _bucket(len(codes))
    dev = (jnp.asarray(sp_pad_codes(codes, cap)), jnp.int32(len(codes)))
    out = rt(params, *dev); jax.block_until_ready(out); time.sleep(1)
    logdir = f'/tmp/rt_topops_{time.time_ns()}'
    with jax.profiler.trace(logdir):
        out = rt(params, *dev)
        jax.block_until_ready(out)
    agg = {}
    for path in glob.glob(os.path.join(logdir, '**', '*.xplane.pb'), recursive=True):
        for pname, evs in parse_xplane(path).items():
            if 'TPU' not in pname: continue
            for line, name, dur in evs:
                if line != 'XLA Ops': continue
                agg.setdefault(name, [0, 0.0])
                agg[name][0] += 1; agg[name][1] += dur/1e9
    for k, (c, t) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:25]:
        print(f'{t:9.1f} ms  n={c:6d}  {k[:140]}')
    os.system(f'rm -rf {logdir}')

if __name__ == '__main__' and len(sys.argv) > 1 and sys.argv[1] == 'topops':
    topops()
