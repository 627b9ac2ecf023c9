"""Isolate where the ~11 ms/conv conditional goes at full-res capacity.

Builds a realistic finest-scale neighbor table from the synthetic LiDAR scan
and device-times (trace, not wall clock — PERFNOTES.md):
  * sparse_conv_apply as shipped (cond tree)
  * each branch body forced: pointwise GEMM, compacted correction, full 27-tap
  * the pieces of the correction branch (argsort, sub-table gather, tap GEMMs)

Usage: python scripts/conv_branch_probe.py [--channels 128]
"""
import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_ms(fn, *args, iters=3, tag=''):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    logdir = f'/tmp/probe_{time.time_ns()}'
    with jax.profiler.trace(logdir):
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
    from fastpcc_tpu.utils.xplane import parse_xplane
    total = 0.0
    n = 0
    for path in glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                          recursive=True):
        for pname, evs in parse_xplane(path).items():
            if 'TPU' not in pname:
                continue
            for line, name, dur in evs:
                if line == 'XLA Modules':
                    total += dur / 1e9
                    n += 1
    os.system(f'rm -rf {logdir}')
    ms = total / max(n, 1)
    print(f'{tag:40s} {ms:8.3f} ms  (n={n})', flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--channels', type=int, default=128)
    ap.add_argument('--resolution', type=int, default=65536)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from fastpcc_tpu.ops import sparse as sp
    from fastpcc_tpu.ops.morton import np_morton_encode
    from fastpcc_tpu.data.datasets.Synthetic import synthetic_lidar_scan
    from fastpcc_tpu.models.lossl_coord.model import _bucket, sp_pad_codes

    ch = args.channels
    xyz = synthetic_lidar_scan(seed=1, resolution=args.resolution)
    codes_np = np.unique(np_morton_encode(xyz.astype(np.int64)))
    n = len(codes_np)
    cap = _bucket(n)
    bits = 16
    codes = jnp.asarray(sp_pad_codes(codes_np, cap))
    count = jnp.int32(n)
    table = jax.jit(sp.build_neighbor_table,
                    static_argnames=('bits', 'scale_bits'))(
        codes, count, bits, bits)
    table = jax.block_until_ready(table)
    lane = np.arange(27)[None, :]
    tnp = np.asarray(table)
    hit = ((tnp < cap) & (lane != 13)).any(1)
    print(f'n={n} cap={cap} rows-with-neighbor={int(hit.sum())} '
          f'({hit.sum()/n:.4f})', flush=True)

    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (cap, ch), jnp.bfloat16)
    w = jax.random.normal(key, (27, ch, ch), jnp.bfloat16) * 0.05

    conv = jax.jit(sp.sparse_conv_apply)
    device_ms(conv, feats, table, w, tag='sparse_conv_apply (cond tree)')

    @jax.jit
    def pointwise(feats, w):
        return jax.lax.dot(feats, w[13],
                           preferred_element_type=jnp.float32
                           ).astype(feats.dtype)
    device_ms(pointwise, feats, w, tag='pointwise center GEMM')

    @jax.jit
    def full27(feats, table, w):
        padded = jnp.concatenate([feats, jnp.zeros((1, ch), feats.dtype)], 0)
        acc = None
        for t in range(27):
            g = feats if t == 13 else padded[table[:, t]]
            o = jax.lax.dot(g, w[t], preferred_element_type=jnp.float32)
            acc = o if acc is None else acc + o
        return acc.astype(feats.dtype)
    device_ms(full27, feats, table, w, tag='full 27-tap path')

    kcap = cap // 8

    @jax.jit
    def correction(feats, table, w):
        lane = jax.lax.broadcasted_iota(jnp.int32, table.shape, 1)
        hit = jnp.any((table < cap) & (lane != 13), axis=1)
        nhit = jnp.sum(hit.astype(jnp.int32))
        order = jnp.argsort(jnp.logical_not(hit).astype(jnp.int32),
                            stable=True).astype(jnp.int32)
        idx = order[:kcap]
        valid_k = jnp.arange(kcap) < jnp.minimum(nhit, kcap)
        tbl_k = jnp.where(valid_k[:, None], table[idx], cap)
        padded = jnp.concatenate([feats, jnp.zeros((1, ch), feats.dtype)], 0)
        corr = None
        for t in range(27):
            if t == 13:
                continue
            g = padded[tbl_k[:, t]]
            o = jax.lax.dot(g, w[t], preferred_element_type=jnp.float32)
            corr = o if corr is None else corr + o
        out = jax.lax.dot(feats, w[13], preferred_element_type=jnp.float32)
        return out.at[idx].add(
            jnp.where(valid_k[:, None], corr, 0.0), mode='drop'
        ).astype(feats.dtype)
    device_ms(correction, feats, table, w, tag='correction branch (forced)')

    @jax.jit
    def argsort_only(table):
        lane = jax.lax.broadcasted_iota(jnp.int32, table.shape, 1)
        hit = jnp.any((table < cap) & (lane != 13), axis=1)
        return jnp.argsort(jnp.logical_not(hit).astype(jnp.int32),
                           stable=True).astype(jnp.int32)
    device_ms(argsort_only, table, tag='hit detect + stable argsort')

    @jax.jit
    def tap_gathers(feats, table, w):
        idx = jnp.arange(kcap, dtype=jnp.int32)
        tbl_k = table[idx]
        padded = jnp.concatenate([feats, jnp.zeros((1, ch), feats.dtype)], 0)
        corr = None
        for t in range(27):
            if t == 13:
                continue
            g = padded[tbl_k[:, t]]
            o = jax.lax.dot(g, w[t], preferred_element_type=jnp.float32)
            corr = o if corr is None else corr + o
        return corr.astype(feats.dtype)
    device_ms(tap_gathers, feats, table, w, tag='26 tap gathers+GEMMs @K')

    # cond overhead probe: trivial branches, same operands
    @jax.jit
    def cond_overhead(feats, table, w):
        nhit = jnp.sum(table)  # data-dependent scalar
        return jax.lax.cond(
            nhit < 0,
            lambda: feats * 2.0,
            lambda: jax.lax.dot(feats, w[13],
                                preferred_element_type=jnp.float32
                                ).astype(feats.dtype))
    device_ms(cond_overhead, feats, table, w,
              tag='cond(trivial, pointwise) overhead')


if __name__ == '__main__':
    main()
