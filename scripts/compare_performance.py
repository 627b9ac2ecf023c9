"""RD comparison across methods: BD-rate/BD-PSNR tables, CSV export, and
per-sample / mean RD plots over every distortion metric present
(reference: scripts/compare_performance.py — multi-method dict, D1/D2,
c[0-3],PSNRF color channels, PCQM/GraphSIM, per-sample figure tree).

Each input is a JSON of {rate_point_name: {file: metrics}} as produced by
scripts/test_batch.py, or a single metric_dict.json.

Usage:
  python scripts/compare_performance.py anchor.json ours=test.json \
      gpcc=tmc3.json --csv out.csv --plot-dir plots/ --mean-plot mean.png

Published-anchor mode (BASELINE.json `published_anchors`): compare a run's
dataset MEAN against encoded literature anchors (clearly labeled — the
anchors are approximate published numbers, the run is typically
surrogate-trained, so this is a trend signal, not a parity claim):
  python scripts/compare_performance.py ours=test.json \
      --anchors BASELINE.json --anchor-dataset kitti_odometry_12bit_lossless_geom
"""
import argparse
import json
import os
import os.path as osp
from collections import defaultdict

import numpy as np

import sys
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from fastpcc_tpu.metrics.bjontegaard import bd_rate, bd_psnr  # noqa: E402

# metric key -> axis label; compared for every key present in all methods
METRIC_KEYS = (
    ('mseF,PSNR (p2point)', 'D1 PSNR (dB)'),
    ('mseF,PSNR (p2plane)', 'D2 PSNR (dB)'),
    ('c[0],PSNRF', 'Y PSNR (dB)'),
    ('c[1],PSNRF', 'U PSNR (dB)'),
    ('c[2],PSNRF', 'V PSNR (dB)'),
    ('c[3],PSNRF', 'YUV PSNR (dB)'),
    ('PCQM', 'PCQM'),
    ('GraphSIM', 'GraphSIM'),
)


def load_rd(path: str, key: str):
    """-> {file: (rates[], values[])} across rate points, for one metric."""
    with open(path) as f:
        data = json.load(f)
    if all(isinstance(v, dict) and 'bpp' in v for v in data.values()):
        data = {'r0': data}
    per_file = defaultdict(lambda: ([], []))
    for rp in sorted(data):
        for file, m in data[rp].items():
            if 'bpp' in m and key in m:
                per_file[file][0].append(m['bpp'])
                per_file[file][1].append(m[key])
    return dict(per_file)


def compare_published_anchors(methods, anchors_path: str, dataset_key: str):
    """Run mean vs encoded literature anchors (BASELINE.json
    published_anchors). Lossless entries compare mean bpp; lossy entries
    BD-rate the run's dataset-mean RD curve against each anchor curve."""
    with open(anchors_path) as f:
        table = json.load(f).get('published_anchors', {})
    if dataset_key not in table:
        known = [k for k in table if not k.startswith('_')]
        raise SystemExit(f'unknown anchor dataset {dataset_key!r}; '
                         f'available: {known}')
    entry = table[dataset_key]
    conf = entry.get('confidence', 'unknown')
    print(f'\n== PUBLISHED-ANCHOR comparison: {entry["dataset"]} ==')
    print(f'   anchors are published literature values (confidence: {conf});')
    print(f'   the run under test is typically surrogate-trained — read this '
          f'as a trend signal, NOT a parity claim.')
    for mname, mpath in methods:
        if entry['task'] == 'lossless-geometry':
            rd = load_rd(mpath, 'bpp')
            bpps = [r for rates, _ in rd.values() for r in rates] or [
                m['bpp'] for rp in json.load(open(mpath)).values()
                for m in (rp.values() if isinstance(rp, dict) else [])
                if isinstance(m, dict) and 'bpp' in m]
            if not bpps:
                print(f'-- {mname}: no bpp entries found in {mpath}')
                continue
            mean_bpp = float(np.mean(bpps))
            print(f'-- {mname}: mean bpp {mean_bpp:.3f}')
            for aname, abpp in entry['anchors'].items():
                ratio = mean_bpp / abpp
                print(f'   vs {aname:24s} (published {abpp:6.2f} bpp): '
                      f'{ratio:6.2f}x anchor rate')
        else:
            key = entry['metric']
            rd = load_rd(mpath, key)
            if not rd:
                print(f'-- {mname}: metric {key!r} absent from {mpath}')
                continue
            lens = {len(r) for r, _ in rd.values()}
            if len(lens) != 1 or lens == {1}:
                print(f'-- {mname}: need >=2 rate points with uniform '
                      f'ladders for BD-rate (got lengths {sorted(lens)})')
                continue
            mr = np.mean([r for r, _ in rd.values()], axis=0)
            mp = np.mean([p for _, p in rd.values()], axis=0)
            print(f'-- {mname}: dataset-mean curve over {len(rd)} files')
            for aname, curve in entry['anchors'].items():
                br = bd_rate(curve['bpp'], curve['psnr'], list(mr), list(mp))
                bp = bd_psnr(curve['bpp'], curve['psnr'], list(mr), list(mp))
                print(f'   vs {aname:24s}: BD-rate {br:8.2f} %  '
                      f'BD-PSNR {bp:7.3f} dB')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('anchor', nargs='?', default='',
                    help='anchor RD json (or name=path); optional when '
                         '--anchors is used')
    ap.add_argument('methods', nargs='*',
                    help='one or more comparison RD jsons, each as '
                         'name=path (bare path: name from the filename)')
    ap.add_argument('--anchors', default='',
                    help='BASELINE.json-style file with published_anchors; '
                         'compares each method mean against the literature')
    ap.add_argument('--anchor-dataset', default='',
                    help='published_anchors key (e.g. '
                         'kitti_odometry_12bit_lossless_geom)')
    ap.add_argument('--csv', default='')
    ap.add_argument('--plot-dir', default='',
                    help='one RD figure per (sample, metric), all methods '
                         'overlaid')
    ap.add_argument('--mean-plot', '--plot', dest='mean_plot', default='',
                    help='dataset-mean RD figure (D1; one per metric when a '
                         'directory is given)')
    ap.add_argument('--metrics', default='',
                    help='comma-separated metric keys (default: every key '
                         'of METRIC_KEYS present in all inputs)')
    args = ap.parse_args()

    def parse_m(spec):
        if '=' in spec:
            name, path = spec.split('=', 1)
        else:
            name, path = osp.splitext(osp.basename(spec))[0], spec
        return name, path

    if args.anchors:
        specs = ([args.anchor] if args.anchor else []) + args.methods
        if not specs:
            raise SystemExit('--anchors needs at least one run json')
        if not args.anchor_dataset:
            raise SystemExit('--anchors requires --anchor-dataset')
        compare_published_anchors([parse_m(s) for s in specs],
                                  args.anchors, args.anchor_dataset)
        return

    if not args.anchor or not args.methods:
        raise SystemExit('need an anchor json plus >=1 method json '
                         '(or use --anchors mode)')
    anchor_name, anchor_path = parse_m(args.anchor)
    methods = [parse_m(s) for s in args.methods]

    if args.metrics:
        keys = [(k, k) for k in args.metrics.split(',')]
    else:
        keys = []
        for key, label in METRIC_KEYS:
            if load_rd(anchor_path, key) and \
                    all(load_rd(p, key) for _, p in methods):
                keys.append((key, label))
    if not keys:
        raise SystemExit('no shared distortion metric across inputs')

    csv_rows = []
    for key, label in keys:
        anchor = load_rd(anchor_path, key)
        print(f'\n== {label} (vs anchor {anchor_name}) ==')
        for mname, mpath in methods:
            test = load_rd(mpath, key)
            rows = []
            for file in sorted(set(anchor) & set(test)):
                ra, pa = anchor[file]
                rt, pt = test[file]
                if len(ra) < 2 or len(rt) < 2:
                    continue
                rows.append((file, bd_rate(ra, pa, rt, pt),
                             bd_psnr(ra, pa, rt, pt)))
            print(f'-- {mname}')
            print(f'{"file":55s} {"BD-rate %":>10s} {"BD-PSNR":>10s}')
            for file, br, bp in rows:
                print(f'{osp.basename(file):55s} {br:10.2f} {bp:10.3f}')
                csv_rows.append((mname, key, file, br, bp))
            if rows:
                mb, mp = (np.mean([r[1] for r in rows]),
                          np.mean([r[2] for r in rows]))
                print(f'{"MEAN":55s} {mb:10.2f} {mp:10.3f}')
                csv_rows.append((mname, key, 'MEAN', mb, mp))

    if args.csv:
        import csv
        with open(args.csv, 'w', newline='') as f:
            w = csv.writer(f)
            w.writerow(('method', 'metric', 'file',
                        'bd_rate_percent', 'bd_psnr'))
            w.writerows(csv_rows)
        print(f'\nwrote {args.csv}')

    if args.plot_dir or args.mean_plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        all_methods = [(anchor_name, anchor_path)] + methods
        for key, label in keys:
            rds = {n: load_rd(p, key) for n, p in all_methods}
            safe = label.replace(' ', '_').replace('(', '').replace(')', '')
            if args.plot_dir:
                out_dir = osp.join(args.plot_dir, f'sample-wise {label}')
                os.makedirs(out_dir, exist_ok=True)
                files = sorted(set.intersection(
                    *[set(rd) for rd in rds.values()]))
                for file in files:
                    fig, ax = plt.subplots(figsize=(4.5, 3.4))
                    for n, rd in rds.items():
                        r, p = rd[file]
                        ax.plot(r, p, marker='o', label=n)
                    ax.grid(True)
                    ax.set_xlabel('BPP (Bits Per Input Point)')
                    ax.set_ylabel(label)
                    ax.set_title(osp.splitext(osp.basename(file))[0])
                    ax.legend(fontsize=7)
                    fig.savefig(osp.join(
                        out_dir,
                        osp.splitext(osp.basename(file))[0] + '.png'),
                        dpi=120, bbox_inches='tight')
                    plt.close(fig)
            if args.mean_plot:
                fig, ax = plt.subplots(figsize=(4.5, 3.4))
                for n, rd in rds.items():
                    lens = {len(r) for r, _ in rd.values()}
                    if len(lens) != 1:
                        continue        # ragged rate ladders: skip the mean
                    ax.plot(np.mean([r for r, _ in rd.values()], axis=0),
                            np.mean([p for _, p in rd.values()], axis=0),
                            marker='o', label=n)
                ax.grid(True)
                ax.set_xlabel('BPP (Bits Per Input Point)')
                ax.set_ylabel(label)
                ax.legend(fontsize=7)
                if osp.splitext(args.mean_plot)[1]:
                    out = args.mean_plot if len(keys) == 1 else \
                        f'{osp.splitext(args.mean_plot)[0]}_{safe}.png'
                else:
                    os.makedirs(args.mean_plot, exist_ok=True)
                    out = osp.join(args.mean_plot, f'mean_{safe}.png')
                fig.savefig(out, dpi=150, bbox_inches='tight')
                plt.close(fig)
                print(f'wrote {out}')
        if args.plot_dir:
            print(f'wrote per-sample RD plots under {args.plot_dir}')


if __name__ == '__main__':
    main()
