"""Timing validation: chain k data-dependent device round trips in ONE jitted
program and check that wall time scales with k. If block_until_ready were
resolving early under the IFRT proxy, time(k) would not grow with k; the
slope is a sync-artifact-free per-roundtrip cost."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fastpcc_tpu.models.lossl_coord import Config
    from fastpcc_tpu.models.lossl_coord.model import Model, _bucket, sp_pad_codes
    from fastpcc_tpu.data.datasets.Synthetic import synthetic_lidar_scan
    from fastpcc_tpu.ops.morton import np_morton_encode

    cfg = Config()
    cfg.channels = 128
    cfg.coord_bits = 16
    cfg.check()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    def chained(k):
        def f(params, codes, count):
            total = jnp.int32(0)
            ok_all = jnp.bool_(True)
            for _ in range(k):
                coords, ok, nbytes = model._traced_roundtrip(params, codes, count)
                total = total + nbytes
                ok_all = ok_all & ok
                # data dependency: next iteration's codes depend on this
                # round trip's outputs (value-preserving)
                codes = codes ^ (total * 0).astype(codes.dtype)
            return total, ok_all
        return jax.jit(f)

    xyz = synthetic_lidar_scan(seed=1, resolution=65536)
    codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
    cap = _bucket(len(codes))
    dev = (jnp.asarray(sp_pad_codes(codes, cap)), jnp.int32(len(codes)))
    print(f'{len(codes)} points, cap {cap}')

    for k in (1, 2):
        f = chained(k)
        out = f(params, *dev)          # compile
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(params, *dev)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        print(f'k={k}: times {["%.4f" % t for t in ts]} s')


if __name__ == '__main__':
    main()
