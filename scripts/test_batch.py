"""Batch regression harness: sweep config x checkpoint pairs through test.py
subprocesses and merge per-rate metric_dict.json into one results file
(reference: scripts/test_convolutional.py:51-103).

Usage:
  python scripts/test_batch.py --configs 'config/lossl_coord/*_test_r*.yaml' \
      --weights 'weights/lossl_coord/*.pt' --out runs/batch_results.json
"""
import argparse
import glob
import json
import os.path as osp
import subprocess
import sys


def config_to_weight(cfg_path: str, weight_glob: str) -> str:
    """Map a test config to its checkpoint by stem prefix matching
    (reference: scripts/test_convolutional.py:36-48)."""
    stem = osp.splitext(osp.basename(cfg_path))[0]
    base = stem.split('_test')[0]
    candidates = sorted(glob.glob(weight_glob))
    for c in candidates:
        if osp.splitext(osp.basename(c))[0].startswith(base):
            return c
    return candidates[0] if candidates else ''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--configs', required=True)
    ap.add_argument('--weights', default='')
    ap.add_argument('--out', default='runs/batch_results.json')
    ap.add_argument('--extra', nargs='*', default=[])
    args = ap.parse_args()

    merged = {}
    for cfg_path in sorted(glob.glob(args.configs)):
        cmd = [sys.executable, 'test.py', cfg_path] + args.extra
        if args.weights:
            w = config_to_weight(cfg_path, args.weights)
            if w:
                cmd.append(f'test.from_ckpt={w}')
        print('>>', ' '.join(cmd), flush=True)
        res = subprocess.run(cmd)
        if res.returncode != 0:
            print(f'FAILED: {cfg_path}', file=sys.stderr)
            continue
        runs = sorted(glob.glob('runs/test_*/results/metric_dict.json'),
                      key=osp.getmtime)
        if runs:
            with open(runs[-1]) as f:
                merged[osp.splitext(osp.basename(cfg_path))[0]] = json.load(f)

    with open(args.out, 'w') as f:
        json.dump(merged, f, indent=2)
    print(f'wrote {args.out} ({len(merged)} rate points)')


if __name__ == '__main__':
    main()
