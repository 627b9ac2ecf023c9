"""G-PCC (tmc3) subprocess wrappers (reference: lib/mpeg_gpcc_utils.py:7-43).

The tmc3 binary is not shipped; set $TMC3_BIN (or pass ``binary``) to enable.
Models fall back to the self-contained raw coordinate coder when absent.
"""
import os
import os.path as osp
import subprocess
import tempfile

import numpy as np

from ..data.ply_io import read_ply, write_ply


def gpcc_available(binary: str = '') -> bool:
    binary = binary or os.environ.get('TMC3_BIN', '')
    return bool(binary) and osp.isfile(binary)


def gpcc_octree_lossless_geom_encode(xyz: np.ndarray, bin_path: str,
                                     binary: str = '') -> bytes:
    binary = binary or os.environ.get('TMC3_BIN', '')
    with tempfile.TemporaryDirectory() as td:
        ply = osp.join(td, 'in.ply')
        write_ply(ply, xyz.astype(np.float32))
        subprocess.run(
            [binary, '--mode=0', '--trisoupNodeSizeLog2=0',
             '--mergeDuplicatedPoints=1', '--neighbourAvailBoundaryLog2=8',
             '--intra_pred_max_node_size_log2=6', '--positionQuantizationScale=1',
             '--inferredDirectCodingMode=1', '--maxNumQtBtBeforeOt=4',
             f'--uncompressedDataPath={ply}',
             f'--compressedStreamPath={bin_path}'],
            check=True, capture_output=True)
        with open(bin_path, 'rb') as f:
            return f.read()


def gpcc_decode(compressed: bytes, binary: str = '') -> np.ndarray:
    binary = binary or os.environ.get('TMC3_BIN', '')
    with tempfile.TemporaryDirectory() as td:
        bin_path = osp.join(td, 'in.bin')
        ply = osp.join(td, 'out.ply')
        with open(bin_path, 'wb') as f:
            f.write(compressed)
        subprocess.run(
            [binary, '--mode=1', f'--compressedStreamPath={bin_path}',
             f'--reconstructedDataPath={ply}', '--outputBinaryPly=1'],
            check=True, capture_output=True)
        return read_ply(ply)['xyz']
