"""Average per-sequence metrics across frames of the same sequence
(reference: scripts/average_seq_metrics.py, 135 LoC): files are grouped by
their parent directory (sequence) and metrics averaged per rate point.
"""
import argparse
import json
import os.path as osp
from collections import defaultdict

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('metric_json')
    ap.add_argument('--out', default='')
    args = ap.parse_args()

    with open(args.metric_json) as f:
        data = json.load(f)
    if all(isinstance(v, dict) and 'bpp' in v for v in data.values()):
        data = {'r0': data}

    out = {}
    for rp, files in data.items():
        seqs = defaultdict(list)
        for path, m in files.items():
            seqs[osp.dirname(path)].append(m)
        rp_out = {}
        for seq, entries in seqs.items():
            keys = set().union(*(e.keys() for e in entries))
            rp_out[seq or '.'] = {
                k: float(np.mean([e[k] for e in entries
                                  if isinstance(e.get(k), (int, float))]))
                for k in sorted(keys)
                if any(isinstance(e.get(k), (int, float)) for e in entries)}
        out[rp] = rp_out

    text = json.dumps(out, indent=2)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(text)
    else:
        print(text)


if __name__ == '__main__':
    main()
