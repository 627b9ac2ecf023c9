"""Per-scale FLOPs + achieved-MXU% report for the flagship roundtrip.

Replaces the reference's per-conv FLOPs hook (reference:
models/convolutional/lossl_coord_me/model.py:24-38) with XLA's own cost
analysis: the per-scale NN helpers (_osp_logits/_osp_upsample/_ms_root/
_ms_chain) are wrapped so every distinct call signature is lowered once and
its HLO flop count recorded, keyed by the scale's row capacity. On TPU the
whole-frame device-trace time turns the total into achieved FLOPs/s and %
of MXU peak.

Usage: python scripts/flops_report.py [--channels 128] [--points 119000]
       [--peak-tflops 197]   # v5e bf16 peak; v5p: 459
"""
import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--channels', type=int, default=128)
    ap.add_argument('--points', type=int, default=119000)
    ap.add_argument('--peak-tflops', type=float, default=197.0,
                    help='bf16 MXU peak of the target chip (v5e=197, v5p=459)')
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    import jax

    from fastpcc_tpu.models import lossl_coord as pkg
    from fastpcc_tpu.models.lossl_coord import model as M

    cfg = pkg.Config(channels=args.channels)
    model = M.Model(cfg)
    rng = np.random.default_rng(args.seed)
    # LiDAR-like shell cloud (structured; matches bench.py's generator scale)
    v = rng.normal(size=(args.points, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = rng.uniform(0.3, 1.0, size=(args.points, 1))
    xyz = np.unique(((v * r * 0.45 + 0.5) * (1 << model.bits))
                    .astype(np.int64).clip(0, (1 << model.bits) - 1), axis=0)

    params = model.init_params(jax.random.PRNGKey(0))

    # --- wrap the per-scale helpers with a flop recorder -------------------
    flops_by = collections.defaultdict(float)   # (helper, cap) -> flops
    calls_by = collections.Counter()
    seen = {}

    def wrap(name, fn):
        def wrapped(*a, **kw):
            cap = None
            for x in a:
                if hasattr(x, 'shape') and getattr(x, 'ndim', 0) >= 1 \
                        and not isinstance(x, (int, float)):
                    cap = int(x.shape[0]) if x.ndim >= 2 else cap
                    if cap is not None:
                        break
            sig = (name,) + tuple(
                (getattr(x, 'shape', None), str(getattr(x, 'dtype', '')))
                for x in jax.tree_util.tree_leaves(a))
            if sig not in seen:
                try:
                    cost = fn.lower(*a, **kw).cost_analysis()
                    seen[sig] = float(cost.get('flops', 0.0)) if cost else 0.0
                except Exception:
                    seen[sig] = 0.0
            flops_by[(name, cap)] += seen[sig]
            calls_by[(name, cap)] += 1
            return fn(*a, **kw)
        return wrapped

    helpers = ['_osp_logits', '_osp_upsample', '_ms_root', '_ms_chain']
    orig = {h: getattr(M, h) for h in helpers}
    for h in helpers:
        setattr(M, h, wrap(h, orig[h]))
    try:
        blob = model.compress(params, xyz)
        back = model.decompress(params, blob)
    finally:
        for h in helpers:
            setattr(M, h, orig[h])
    assert np.array_equal(np.unique(back.astype(np.int64), axis=0), xyz), \
        'roundtrip must stay lossless under instrumentation'

    total = sum(flops_by.values())
    print(f'\n== flagship ch{args.channels}, {len(xyz)} pts, '
          f'{len(blob)} bytes ({len(blob) * 8 / len(xyz):.2f} bpp) ==')
    print(f'{"helper":14} {"cap":>9} {"calls":>6} {"GFLOPs":>10} {"share":>7}')
    for (name, cap), fl in sorted(flops_by.items(),
                                  key=lambda kv: -kv[1]):
        print(f'{name:14} {cap or 0:>9} {calls_by[(name, cap)]:>6} '
              f'{fl / 1e9:>10.2f} {100 * fl / max(total, 1):>6.1f}%')
    print(f'{"TOTAL":14} {"":>9} {sum(calls_by.values()):>6} '
          f'{total / 1e9:>10.2f}')

    if jax.default_backend() in ('tpu', 'axon'):
        from micro_profile import trace_ms
        # measure the whole roundtrip via the device-resident loopback
        ms, _ = trace_ms(
            lambda: model.device_roundtrip(params, xyz), iters=1)
        ach = total / (ms / 1e3)
        print(f'\ndevice roundtrip: {ms:.1f} ms -> achieved '
              f'{ach / 1e12:.2f} TFLOPs/s = '
              f'{100 * ach / (args.peak_tflops * 1e12):.2f}% of '
              f'{args.peak_tflops:.0f} TF bf16 MXU peak')
    else:
        print('\n(non-TPU backend: FLOPs only; run on TPU for MXU%)')


if __name__ == '__main__':
    main()
