"""Flatten metric_dict.json (or a batch-merged file) into CSV
(reference: scripts/convert_metric_dict_to_csv.py)."""
import argparse
import csv
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('metric_json')
    ap.add_argument('--out', default='')
    args = ap.parse_args()

    with open(args.metric_json) as f:
        data = json.load(f)
    if all(isinstance(v, dict) and 'bpp' in v for v in data.values()):
        data = {'r0': data}

    keys = set()
    rows = []
    for rp, files in data.items():
        for path, m in files.items():
            row = {'rate_point': rp, 'file': path}
            row.update({k: v for k, v in m.items()
                        if isinstance(v, (int, float, str))})
            keys.update(row.keys())
            rows.append(row)
    fieldnames = ['rate_point', 'file'] + sorted(keys - {'rate_point', 'file'})
    out = open(args.out, 'w', newline='') if args.out else sys.stdout
    w = csv.DictWriter(out, fieldnames=fieldnames)
    w.writeheader()
    w.writerows(rows)
    if args.out:
        out.close()


if __name__ == '__main__':
    main()
