"""V-PCC (tmc2) baseline runner -> metric_dict.json schema
(reference: scripts/test_tmc2.py, 180 LoC). Requires $TMC2_DIR with built
PccAppEncoder/PccAppDecoder and the common test configs.

Usage: python scripts/test_tmc2.py <dyn_seq_dir> [out_dir]
"""
import glob
import json
import os
import os.path as osp
import subprocess
import sys
import tempfile

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np

from scripts.script_config import tmc2_dir, metric_dict_filename
from fastpcc_tpu.data.ply_io import read_ply
from fastpcc_tpu.metrics.pc_error import compute_d1_d2_psnr

RATE_CFGS = [f'r{i}' for i in range(1, 6)]   # common/ctc rate configs


def main():
    enc_bin = osp.join(tmc2_dir, 'bin', 'PccAppEncoder')
    dec_bin = osp.join(tmc2_dir, 'bin', 'PccAppDecoder')
    if not (osp.isfile(enc_bin) and osp.isfile(dec_bin)):
        print(f'tmc2 binaries not found under {tmc2_dir} (set $TMC2_DIR); '
              'nothing to do', file=sys.stderr)
        return 0
    seq_dir = sys.argv[1]
    out_root = sys.argv[2] if len(sys.argv) > 2 else 'runs/tmc2'
    files = sorted(glob.glob(osp.join(seq_dir, '*.ply')))
    for r, rate in enumerate(RATE_CFGS):
        out_dir = osp.join(out_root, rate)
        os.makedirs(out_dir, exist_ok=True)
        metric_dict = {}
        for path in files:
            xyz = read_ply(path)['xyz']
            with tempfile.TemporaryDirectory() as td:
                binf = osp.join(td, 'out.bin')
                recf = osp.join(td, 'rec_%04d.ply')
                cfgd = osp.join(tmc2_dir, 'cfg')
                subprocess.run(
                    [enc_bin,
                     f'--config={cfgd}/common/ctc-common.cfg',
                     f'--config={cfgd}/condition/ctc-all-intra.cfg',
                     f'--config={cfgd}/rate/ctc-{rate}.cfg',
                     f'--uncompressedDataPath={path}',
                     f'--compressedStreamPath={binf}',
                     '--frameCount=1'],
                    check=True, capture_output=True)
                subprocess.run(
                    [dec_bin, f'--compressedStreamPath={binf}',
                     f'--reconstructedDataPath={recf}'],
                    check=True, capture_output=True)
                nbytes = osp.getsize(binf)
                rec = read_ply(recf % 0)['xyz']
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
            print(f'{rate} {path}: bpp={entry["bpp"]:.3f}')
        with open(osp.join(out_dir, metric_dict_filename), 'w') as f:
            json.dump(metric_dict, f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
