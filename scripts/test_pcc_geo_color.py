"""pcc-geo-color baseline runner -> metric_dict.json schema
(reference: scripts/test_pcc_geo_color.py, 123 LoC). Requires
$PCC_GEO_COLOR_DIR with the published codebase + weights.

Usage: python scripts/test_pcc_geo_color.py <ply_glob> [out_dir]
"""
import glob
import json
import os
import os.path as osp
import subprocess
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np

from scripts.script_config import pcc_geo_color_dir, metric_dict_filename
from fastpcc_tpu.data.ply_io import read_ply
from fastpcc_tpu.metrics.pc_error import compute_d1_d2_psnr, \
    compute_color_psnr

RATES = ('r1', 'r2', 'r3', 'r4', 'r5')


def main():
    src = osp.join(pcc_geo_color_dir, 'compress.py')
    if not osp.isfile(src):
        print(f'pcc-geo-color not found under {pcc_geo_color_dir} '
              '(set $PCC_GEO_COLOR_DIR); nothing to do', file=sys.stderr)
        return 0
    pattern = sys.argv[1]
    out_root = sys.argv[2] if len(sys.argv) > 2 else 'runs/pcc_geo_color'
    files = sorted(glob.glob(pattern, recursive=True))
    for rate in RATES:
        out_dir = osp.join(out_root, rate)
        os.makedirs(out_dir, exist_ok=True)
        metric_dict = {}
        for path in files:
            data = read_ply(path)
            xyz = data['xyz']
            base = osp.splitext(osp.basename(path))[0]
            subprocess.run(
                [sys.executable, src, path, out_dir,
                 f'--model={rate}'],
                check=True, capture_output=True, cwd=pcc_geo_color_dir)
            binf = osp.join(out_dir, base + '.bin')
            subprocess.run(
                [sys.executable,
                 osp.join(pcc_geo_color_dir, 'decompress.py'),
                 binf, out_dir],
                check=True, capture_output=True, cwd=pcc_geo_color_dir)
            recd = read_ply(osp.join(out_dir, base + '.dec.ply'))
            rec = recd['xyz']
            nbytes = osp.getsize(binf)
            res = float(xyz.max() - xyz.min() + 1)
            entry = {
                'input_points_num': int(len(xyz)),
                'output_points_num': int(len(rec)),
                'compressed_bytes': int(nbytes),
                'bpp': nbytes * 8 / len(xyz),
            }
            entry.update(compute_d1_d2_psnr(rec.astype(np.float64),
                                            xyz.astype(np.float64), res))
            if 'rgb' in data and 'rgb' in recd:
                entry.update(compute_color_psnr(
                    rec.astype(np.float64), recd['rgb'].astype(np.float64),
                    xyz.astype(np.float64), data['rgb'].astype(np.float64)))
            metric_dict[path] = entry
        with open(osp.join(out_dir, metric_dict_filename), 'w') as f:
            json.dump(metric_dict, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
