"""G-PCC (tmc3) baseline runner producing the framework's metric_dict.json
schema for BD-rate comparison (reference: scripts/test_tmc3.py:33-299,
written against mpeg-pcc-tmc13 v26rc2).

Usage: python scripts/test_tmc3.py <filelist_or_glob> [out_dir]
Requires $TMC3_BIN (and optionally $PC_ERROR_BIN for the MPEG metric binary;
falls back to the in-process D1/D2 implementation).
"""
import glob as globlib
import json
import os
import os.path as osp
import subprocess
import sys
import tempfile

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np

from scripts.script_config import tmc3_path, metric_dict_filename
from fastpcc_tpu.data.ply_io import read_ply, write_ply
from fastpcc_tpu.metrics.pc_error import compute_d1_d2_psnr

# octree-RAHT rate points (reference: test_tmc3.py rate-point loops)
RATE_POINTS = [
    dict(positionQuantizationScale=s) for s in
    (1, 0.5, 0.25, 0.125, 0.0625, 0.03125)
]


def run_one(path: str, out_dir: str, rate_idx: int, scale) -> dict:
    xyz = read_ply(path)['xyz']
    base = osp.splitext(osp.basename(path))[0]
    with tempfile.TemporaryDirectory() as td:
        binf = osp.join(td, 'out.bin')
        recf = osp.join(td, 'rec.ply')
        enc = [tmc3_path, '--mode=0', '--trisoupNodeSizeLog2=0',
               '--mergeDuplicatedPoints=1', '--neighbourAvailBoundaryLog2=8',
               '--intra_pred_max_node_size_log2=6',
               f'--positionQuantizationScale={scale}',
               '--maxNumQtBtBeforeOt=4', '--minQtbtSizeLog2=0',
               '--planarEnabled=1', '--planarModeIdcmUse=0',
               f'--uncompressedDataPath={path}',
               f'--compressedStreamPath={binf}']
        subprocess.run(enc, check=True, capture_output=True)
        dec = [tmc3_path, '--mode=1', f'--compressedStreamPath={binf}',
               f'--reconstructedDataPath={recf}',
               '--outputBinaryPly=0']
        subprocess.run(dec, check=True, capture_output=True)
        nbytes = osp.getsize(binf)
        rec = read_ply(recf)['xyz']
    res = float(xyz.max() - xyz.min() + 1)
    out = {
        'input_points_num': int(len(xyz)),
        'output_points_num': int(len(rec)),
        'compressed_bytes': int(nbytes),
        'bpp': nbytes * 8 / len(xyz),
    }
    out.update(compute_d1_d2_psnr(rec.astype(np.float64),
                                  xyz.astype(np.float64), res))
    return out


def main():
    if not osp.isfile(tmc3_path):
        print(f'tmc3 binary not found at {tmc3_path} (set $TMC3_BIN); '
              'nothing to do', file=sys.stderr)
        return 0
    pattern = sys.argv[1] if len(sys.argv) > 1 else 'datasets/**/*.ply'
    out_root = sys.argv[2] if len(sys.argv) > 2 else 'runs/tmc3'
    if osp.isfile(pattern) and pattern.endswith('.txt'):
        root = osp.dirname(pattern)
        with open(pattern) as f:
            files = [osp.join(root, line.strip()) for line in f]
    else:
        files = sorted(globlib.glob(pattern, recursive=True))
    for r, rp in enumerate(RATE_POINTS):
        out_dir = osp.join(out_root, f'r{r + 1}')
        os.makedirs(out_dir, exist_ok=True)
        metric_dict = {}
        for path in files:
            metric_dict[path] = run_one(
                path, out_dir, r, rp['positionQuantizationScale'])
            print(f'r{r + 1} {path}: bpp={metric_dict[path]["bpp"]:.3f}')
        with open(osp.join(out_dir, metric_dict_filename), 'w') as f:
            json.dump(metric_dict, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
