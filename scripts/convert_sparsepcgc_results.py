"""Convert published SparsePCGC result tables into the framework's
metric_dict.json schema for BD-rate comparison
(reference: scripts/convert_sparsepcgc_results.py).

Input: a CSV/TSV with columns [file, bpp, d1_psnr[, d2_psnr]] per rate point
(one file per rate point, named r1.csv ...), or a JSON list of such rows.
Usage: python scripts/convert_sparsepcgc_results.py <in_dir> <out_dir>
"""
import csv
import json
import os
import os.path as osp
import sys


def convert_file(path: str) -> dict:
    metric_dict = {}
    if path.endswith('.json'):
        with open(path) as f:
            rows = json.load(f)
    else:
        with open(path) as f:
            dialect = csv.Sniffer().sniff(f.read(2048))
            f.seek(0)
            rows = list(csv.DictReader(f, dialect=dialect))
    for row in rows:
        entry = {'bpp': float(row['bpp'])}
        if 'd1_psnr' in row and row['d1_psnr']:
            entry['mseF,PSNR (p2point)'] = float(row['d1_psnr'])
        if 'd2_psnr' in row and row.get('d2_psnr'):
            entry['mseF,PSNR (p2plane)'] = float(row['d2_psnr'])
        metric_dict[row['file']] = entry
    return metric_dict


def main():
    in_dir, out_dir = sys.argv[1], sys.argv[2]
    for name in sorted(os.listdir(in_dir)):
        if not name.endswith(('.csv', '.tsv', '.json')):
            continue
        rate = osp.splitext(name)[0]
        od = osp.join(out_dir, rate)
        os.makedirs(od, exist_ok=True)
        with open(osp.join(od, 'metric_dict.json'), 'w') as f:
            json.dump(convert_file(osp.join(in_dir, name)), f, indent=2)
        print('converted', name, '->', od)


if __name__ == '__main__':
    main()
