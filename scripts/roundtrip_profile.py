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
    rt = jax.jit(model._traced_roundtrip)

    xyz = synthetic_lidar_scan(seed=1, resolution=65536)
    codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
    cap = _bucket(len(codes))
    dev = (jnp.asarray(sp_pad_codes(codes, cap)), jnp.int32(len(codes)))
    n = len(codes)
    ms, c = trace_ms(rt, params, *dev, iters=2)
    print(f'roundtrip {n} pts ch{cfg.channels}: {ms:.1f} ms/exec ({c} execs) '
          f'-> {n / ms / 1000:.3f} Mpts/s encode+decode')
    out = rt(params, *dev)
    print('lossless:', bool(out[1]))


if __name__ == '__main__':
    main()
