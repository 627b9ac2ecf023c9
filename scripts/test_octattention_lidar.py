"""OctAttention (LiDAR) baseline runner -> metric_dict.json schema
(reference: scripts/test_octattention_lidar.py, 170 LoC). Requires
$OCTATTENTION_DIR with the published codebase + lidar weights.

Usage: python scripts/test_octattention_lidar.py <ply_or_bin_glob> [out_dir]
"""
import glob
import json
import os
import os.path as osp
import subprocess
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np

from scripts.script_config import octattention_dir, metric_dict_filename
from fastpcc_tpu.data.ply_io import read_ply, write_ply
from fastpcc_tpu.metrics.pc_error import compute_d1_d2_psnr

QLEVELS = (12, 11, 10, 9, 8)     # quantization rate ladder


def _load(path):
    if path.endswith('.bin'):
        return np.fromfile(path, '<f4').reshape(-1, 4)[:, :3]
    return read_ply(path)['xyz']


def main():
    entry_py = osp.join(octattention_dir, 'encoder.py')
    if not osp.isfile(entry_py):
        print(f'OctAttention not found under {octattention_dir} '
              '(set $OCTATTENTION_DIR); nothing to do', file=sys.stderr)
        return 0
    pattern = sys.argv[1]
    out_root = sys.argv[2] if len(sys.argv) > 2 else 'runs/octattention'
    files = sorted(glob.glob(pattern, recursive=True))
    for r, q in enumerate(QLEVELS):
        out_dir = osp.join(out_root, f'r{r + 1}')
        os.makedirs(out_dir, exist_ok=True)
        metric_dict = {}
        for path in files:
            xyz = _load(path)
            base = osp.splitext(osp.basename(path))[0]
            tmp_ply = osp.join(out_dir, base + '_in.ply')
            write_ply(tmp_ply, xyz)
            subprocess.run(
                [sys.executable, entry_py, tmp_ply, f'--qlevel={q}',
                 f'--out={out_dir}'],
                check=True, capture_output=True, cwd=octattention_dir)
            binf = osp.join(out_dir, base + '_in.bin')
            subprocess.run(
                [sys.executable, osp.join(octattention_dir, 'decoder.py'),
                 binf, f'--out={out_dir}'],
                check=True, capture_output=True, cwd=octattention_dir)
            rec = read_ply(osp.join(out_dir, base + '_in_rec.ply'))['xyz']
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
