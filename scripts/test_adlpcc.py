"""ADLPCC baseline runner -> metric_dict.json schema
(reference: scripts/test_adlpcc.py, 132 LoC). Requires $ADLPCC_DIR with the
published ADLPCC codebase + weights.

Usage: python scripts/test_adlpcc.py <ply_glob> [out_dir]
"""
import glob
import json
import os
import os.path as osp
import subprocess
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np

from scripts.script_config import adlpcc_path, metric_dict_filename
from fastpcc_tpu.data.ply_io import read_ply
from fastpcc_tpu.metrics.pc_error import compute_d1_d2_psnr

LAMBDAS = ['0.00025', '0.0005', '0.001', '0.002', '0.004']


def main():
    src = osp.join(adlpcc_path, 'src', 'ADLPCC.py')
    if not osp.isfile(src):
        print(f'ADLPCC not found under {adlpcc_path} (set $ADLPCC_DIR); '
              'nothing to do', file=sys.stderr)
        return 0
    pattern = sys.argv[1]
    out_root = sys.argv[2] if len(sys.argv) > 2 else 'runs/adlpcc'
    files = sorted(glob.glob(pattern, recursive=True))
    for r, lam in enumerate(LAMBDAS):
        out_dir = osp.join(out_root, f'r{r + 1}')
        os.makedirs(out_dir, exist_ok=True)
        metric_dict = {}
        for path in files:
            xyz = read_ply(path)['xyz']
            subprocess.run(
                [sys.executable, src, 'compress', path, f'--blk_size=128',
                 f'--model_dir={osp.join(adlpcc_path, "models", lam)}',
                 f'--out_dir={out_dir}'],
                check=True, capture_output=True, cwd=adlpcc_path)
            base = osp.splitext(osp.basename(path))[0]
            binf = osp.join(out_dir, base + '.pkl.gz')
            subprocess.run(
                [sys.executable, src, 'decompress', binf,
                 f'--out_dir={out_dir}'],
                check=True, capture_output=True, cwd=adlpcc_path)
            rec = read_ply(osp.join(out_dir, base + '.dec.ply'))['xyz']
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
            metric_dict[path] = entry
        with open(osp.join(out_dir, metric_dict_filename), 'w') as f:
            json.dump(metric_dict, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
