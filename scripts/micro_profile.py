"""Device-trace micro-benchmarks: per-component REAL device times.

All wall-clock timing is meaningless on this rig (block_until_ready resolves
early); this measures XLA-module device durations from profiler traces.
Usage: python scripts/micro_profile.py [conv|table|cdf|dec|enc|expand|all]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time


def trace_ms(fn, *args, iters=2, warmup=True):
    """Device time (ms) per execution of jitted fn, via xplane module times."""
    import jax
    from fastpcc_tpu.utils.xplane import parse_xplane
    import glob
    if warmup:
        out = fn(*args)
        jax.block_until_ready(out)
        time.sleep(1)
    logdir = f'/tmp/mp_trace_{time.time_ns()}'
    with jax.profiler.trace(logdir):
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
        # the trace stop blocks until the device actually finishes
    total = 0.0
    count = 0
    for path in glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                          recursive=True):
        for pname, evs in parse_xplane(path).items():
            if 'TPU' not in pname:
                continue
            for line, name, dur in evs:
                if line == 'XLA Modules':
                    total += dur / 1e9
                    count += 1
    os.system(f'rm -rf {logdir}')
    return total / max(count, 1), count


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fastpcc_tpu.ops import sparse as sp
    from fastpcc_tpu.ops import ilv_rans as ir
    from fastpcc_tpu.ops.morton import np_morton_encode

    rng = np.random.default_rng(0)
    n, ch = 131072, 128
    codes_np = np.sort(rng.choice(1 << 40, size=n, replace=False)).astype(np.int64)
    codes = jnp.asarray(codes_np)
    count = jnp.int32(n)
    bits = 16

    table = sp.build_neighbor_table(codes, count, bits, bits)
    feats = jnp.asarray(rng.normal(size=(n, ch)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(27, ch, ch)).astype(np.float32) * 0.01).astype(jnp.bfloat16)
    jax.block_until_ready((table, feats, w))

    if which in ('conv', 'all'):
        f = jax.jit(lambda ft, tb, ww: sp.sparse_conv_apply(ft, tb, ww))
        ms, c = trace_ms(f, feats, table, w)
        gflop = 2 * n * 27 * ch * ch / 1e9
        print(f'conv3x3 {n}x{ch}: {ms:.2f} ms/exec ({c} execs), '
              f'{gflop/ms:.0f} GFLOP/ms -> {gflop/ms:.1f} TFLOPs')

    if which in ('table', 'all'):
        f = jax.jit(lambda c, n_: sp.build_neighbor_table(c, n_, bits, bits))
        ms, c2 = trace_ms(f, codes, count)
        print(f'neighbor table {n}: {ms:.2f} ms/exec ({c2} execs)')

    if which in ('cdf', 'all'):
        logits = jnp.asarray(rng.normal(size=(n, 255)).astype(np.float32))
        from fastpcc_tpu.models.lossl_coord.model import _cdf_rows
        ms, c2 = trace_ms(_cdf_rows, logits)
        print(f'cdf rows {n}x255: {ms:.2f} ms/exec ({c2} execs)')

    if which in ('dec', 'enc', 'all'):
        lanes = 1024
        s = 255
        pmf = rng.dirichlet(np.full(s, 0.5), size=n)
        q = np.floor(pmf * (65536 - s)) + 1.0
        cdf = np.cumsum(q, axis=-1); cdf[:, -1] = 65535
        cdfs = jnp.asarray(cdf.astype(np.uint16))
        syms = jnp.asarray(rng.integers(0, s, size=n).astype(np.int32))
        capw = ir.word_capacity_for(n, lanes)
        st0, bp0, buf0 = ir.init_encoder(lanes, capw)

        @jax.jit
        def enc(cdfs, syms):
            sta, fq = ir.enc_pairs(cdfs, syms)
            rs, bp, bf = ir.encode_segment(st0, bp0, buf0, sta, fq, count)
            return ir.encode_flush(rs, bp, bf)
        if which in ('enc', 'all'):
            ms, c2 = trace_ms(enc, cdfs, syms)
            print(f'ilv encode {n} syms: {ms:.2f} ms/exec ({c2} execs), '
                  f'{n/ms/1000:.1f} Msym/s')

        bp1, buf1 = enc(cdfs, syms)
        jax.block_until_ready(buf1)

        @jax.jit
        def dec(bp, buf, cdfs):
            rs, ptr = ir.init_decoder(buf, bp, lanes)
            return ir.decode_segment(rs, ptr, buf, cdfs, count)[2]
        if which in ('dec', 'all'):
            ms, c2 = trace_ms(dec, bp1, buf1, cdfs)
            print(f'ilv decode {n} syms: {ms:.2f} ms/exec ({c2} execs), '
                  f'{n/ms/1000:.1f} Msym/s')

    if which in ('expand', 'all'):
        bins = jnp.asarray(rng.integers(0, 2, size=(n, 8)).astype(bool))
        f = jax.jit(lambda c, n_, b: sp.expand_children(c, n_, b, bits, 2 * n))
        ms, c2 = trace_ms(f, codes, count, bins)
        print(f'expand_children {n}: {ms:.2f} ms/exec ({c2} execs)')


if __name__ == '__main__':
    main()

def extra():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fastpcc_tpu.ops import sparse as sp
    rng = np.random.default_rng(0)
    n, bits = 131072, 16
    codes_np = np.sort(rng.choice(1 << 40, size=n, replace=False)).astype(np.int64)
    codes = jnp.asarray(codes_np); count = jnp.int32(n)
    parent, bins, c2p = sp.downsample_with_bins(codes, count, bits, 0)
    octant = (codes & 7).astype(jnp.int32)
    ptab = sp.build_neighbor_table(parent.codes, parent.count, bits, bits - 1)
    jax.block_until_ready((ptab, c2p, octant))
    f = jax.jit(lambda pt, cp, oc, n_: sp.child_table_from_parent(pt, cp, oc, n_))
    ms, c = trace_ms(f, ptab, c2p, octant, count)
    print(f'child_table_from_parent {n}: {ms:.2f} ms/exec ({c} execs)')
    tab = f(ptab, c2p, octant, count)
    gidx = jnp.arange(n, dtype=jnp.int32)
    g = jax.jit(lambda t, gi, nc: sp.compact_table(t, gi, nc))
    ms, c = trace_ms(g, tab, gidx, jnp.int32(n // 2))
    print(f'compact_table {n}: {ms:.2f} ms/exec ({c} execs)')

if __name__ == '__main__' and len(sys.argv) > 1 and sys.argv[1] == 'extra':
    extra()

def conv_variants():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fastpcc_tpu.ops import sparse as sp
    rng = np.random.default_rng(0)
    n, ch = 131072, 128
    codes_np = np.sort(rng.choice(1 << 40, size=n, replace=False)).astype(np.int64)
    codes = jnp.asarray(codes_np); count = jnp.int32(n)
    table = sp.build_neighbor_table(codes, count, 16, 16)
    feats = jnp.asarray(rng.normal(size=(n, ch)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.normal(size=(27, ch, ch)) * 0.01).astype(np.float32)).astype(jnp.bfloat16)
    jax.block_until_ready((table, feats, w))
    gflop = 2 * n * 27 * ch * ch / 1e9

    f1 = jax.jit(lambda ft, tb, ww: sp.sparse_conv_apply(ft, tb, ww, row_chunk=1 << 30))
    ms, c = trace_ms(f1, feats, table, w)
    print(f'conv single-pass: {ms:.2f} ms ({gflop/ms:.1f} TFLOPs)')

    def conv_onehotfree(ft, tb, ww):
        padded = jnp.concatenate([ft, jnp.zeros((1, ch), ft.dtype)], 0)
        acc = None
        for t in range(27):
            g = padded[tb[:, t]]
            o = g @ ww[t]
            acc = o if acc is None else acc + o
        return acc
    f2 = jax.jit(conv_onehotfree)
    ms, c = trace_ms(f2, feats, table, w)
    print(f'conv 27 per-tap gathers: {ms:.2f} ms ({gflop/ms:.1f} TFLOPs)')

if __name__ == '__main__' and len(sys.argv) > 1 and sys.argv[1] == 'convv':
    conv_variants()
