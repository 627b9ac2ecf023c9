"""RD comparison between methods: BD-rate/BD-PSNR tables + optional RD plots
and CSV export (reference: scripts/compare_performance.py:22-66, 466 LoC).

Each input is a JSON of {rate_point_name: {file: metrics}} as produced by
scripts/test_batch.py, or a single metric_dict.json.
"""
import argparse
import json
import os.path as osp
from collections import defaultdict

import numpy as np

import sys
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from fastpcc_tpu.metrics.bjontegaard import bd_rate, bd_psnr  # noqa: E402

PSNR_KEY = 'mseF,PSNR (p2point)'


def load_rd(path: str):
    """-> {file: (rates[], psnrs[])} across rate points."""
    with open(path) as f:
        data = json.load(f)
    if all(isinstance(v, dict) and 'bpp' in v for v in data.values()):
        data = {'r0': data}
    per_file = defaultdict(lambda: ([], []))
    for rp in sorted(data):
        for file, m in data[rp].items():
            if 'bpp' in m and PSNR_KEY in m:
                per_file[file][0].append(m['bpp'])
                per_file[file][1].append(m[PSNR_KEY])
    return per_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('anchor')
    ap.add_argument('test')
    ap.add_argument('--csv', default='')
    ap.add_argument('--plot', default='')
    ap.add_argument('--plot-dir', default='',
                    help='write one RD curve figure per sample '
                         '(reference: compare_performance.py per-sample plots)')
    ap.add_argument('--psnr-key', default=PSNR_KEY)
    args = ap.parse_args()

    anchor = load_rd(args.anchor)
    test = load_rd(args.test)
    rows = []
    for file in sorted(set(anchor) & set(test)):
        ra, pa = anchor[file]
        rt, pt = test[file]
        if len(ra) < 2 or len(rt) < 2:
            continue
        rows.append((file, bd_rate(ra, pa, rt, pt), bd_psnr(ra, pa, rt, pt)))

    print(f'{"file":60s} {"BD-rate %":>10s} {"BD-PSNR dB":>10s}')
    for file, br, bp in rows:
        print(f'{osp.basename(file):60s} {br:10.2f} {bp:10.3f}')
    if rows:
        print(f'{"MEAN":60s} {np.mean([r[1] for r in rows]):10.2f} '
              f'{np.mean([r[2] for r in rows]):10.3f}')

    if args.csv:
        with open(args.csv, 'w') as f:
            f.write('file,bd_rate_percent,bd_psnr_db\n')
            for file, br, bp in rows:
                f.write(f'{file},{br},{bp}\n')
    if args.plot_dir:
        import os
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        os.makedirs(args.plot_dir, exist_ok=True)
        for file in sorted(set(anchor) & set(test)):
            fig, ax = plt.subplots()
            ra, pa = anchor[file]
            rt, pt = test[file]
            ax.plot(ra, pa, marker='o', label='anchor')
            ax.plot(rt, pt, marker='s', label='test')
            ax.set_xlabel('bpp')
            ax.set_ylabel('D1 PSNR (dB)')
            ax.set_title(osp.basename(file))
            ax.legend()
            out = osp.join(args.plot_dir,
                           osp.splitext(osp.basename(file))[0] + '_rd.png')
            fig.savefig(out, dpi=120)
            plt.close(fig)
        print(f'wrote per-sample RD plots to {args.plot_dir}')
    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        for label, rd in (('anchor', anchor), ('test', test)):
            all_r = np.mean([r for r, _ in rd.values()], axis=0)
            all_p = np.mean([p for _, p in rd.values()], axis=0)
            ax.plot(all_r, all_p, marker='o', label=label)
        ax.set_xlabel('bpp')
        ax.set_ylabel('D1 PSNR (dB)')
        ax.legend()
        fig.savefig(args.plot, dpi=150)
        print(f'wrote {args.plot}')


if __name__ == '__main__':
    main()
