"""Point-cloud geometry distortion metrics.

Two paths, same metric keys as the reference's wrapper
(reference: lib/metrics/pc_error_wrapper.py:40-107):
  * ``mpeg_pc_error``: subprocess wrapper around the MPEG ``pc_error`` binary
    when one is available (path via $PC_ERROR_BIN or config).
  * ``compute_d1_d2_psnr``: in-process scipy implementation of the same
    D1 (point-to-point) and D2 (point-to-plane) symmetric PSNR — the default
    here since the prebuilt binary is not shipped with this repo.
"""
import os
import re
import subprocess
from typing import Dict, Optional

import numpy as np


def _nn(src: np.ndarray, dst: np.ndarray):
    from scipy.spatial import cKDTree
    dist, idx = cKDTree(dst).query(src, k=1, workers=-1)
    return dist, idx


def _estimate_normals(xyz: np.ndarray, k: int = 12) -> np.ndarray:
    from scipy.spatial import cKDTree
    tree = cKDTree(xyz)
    _, nbr = tree.query(xyz, k=min(k, len(xyz)), workers=-1)
    pts = xyz[nbr]                       # [N, k, 3]
    centered = pts - pts.mean(1, keepdims=True)
    cov = np.einsum('nki,nkj->nij', centered, centered)
    # eigenvector of the smallest eigenvalue = surface normal
    w, v = np.linalg.eigh(cov)
    return v[:, :, 0]


def compute_d1_d2_psnr(pred: np.ndarray, ref: np.ndarray, resolution: float,
                       normals: Optional[np.ndarray] = None,
                       compute_d2: bool = True) -> Dict[str, float]:
    """Symmetric D1/D2 PSNR with peak = resolution - 1, matching MPEG
    pc_error conventions (max of the two directional MSEs; derived key
    'mse1+mse2 (p2point)' kept for parity with the reference's post-processing,
    reference: lib/metrics/pc_error_wrapper.py:88-96)."""
    pred = pred.astype(np.float64)
    ref = ref.astype(np.float64)
    peak2 = float(resolution - 1) ** 2

    d_ab, idx_ab = _nn(pred, ref)
    d_ba, idx_ba = _nn(ref, pred)
    mse1 = float((d_ab ** 2).mean())
    mse2 = float((d_ba ** 2).mean())
    mse_sym = max(mse1, mse2)
    out = {
        'mse1      (p2point)': mse1,
        'mse2      (p2point)': mse2,
        'mseF      (p2point)': mse_sym,
        'mse1+mse2 (p2point)': mse1 + mse2,
        'mseF,PSNR (p2point)': 10 * np.log10(peak2 / mse_sym) if mse_sym > 0
                               else float('inf'),
    }
    if compute_d2:
        if normals is None:
            normals = _estimate_normals(ref)
        err_ab = pred - ref[idx_ab]
        p2pl_ab = float((np.einsum('nd,nd->n', err_ab, normals[idx_ab]) ** 2).mean())
        nrm_pred = normals[idx_ab]  # transfer ref normals to pred via NN
        err_ba = ref - pred[idx_ba]
        p2pl_ba = float((np.einsum('nd,nd->n', err_ba, nrm_pred[idx_ba]) ** 2).mean())
        msef = max(p2pl_ab, p2pl_ba)
        out['mseF      (p2plane)'] = msef
        out['mseF,PSNR (p2plane)'] = (10 * np.log10(peak2 / msef)
                                      if msef > 0 else float('inf'))
    return out


_FLOAT_RE = re.compile(r'(mse\S*|c\[\d\],PSNRF|h\.\S*)\s*[,:]?\s*(p2point|p2plane)?\)?\s*:\s*([0-9.e+-]+|inf)')


def mpeg_pc_error(infile1: str, infile2: str, resolution: float,
                  normal_file: str = '', color: bool = False,
                  reflectance: bool = False,
                  threads: int = 1, binary: str = '') -> Dict[str, float]:
    """Run the MPEG pc_error binary and parse its stdout
    (reference: lib/metrics/pc_error_wrapper.py:40-107). Returns {} if no
    binary is available."""
    binary = binary or os.environ.get('PC_ERROR_BIN', '')
    if not binary or not os.path.isfile(binary):
        return {}
    cmd = [binary, f'--fileA={infile1}', f'--fileB={infile2}',
           f'--resolution={resolution}', '--hausdorff=1',
           f'--nbThreads={threads}']
    if normal_file:
        cmd.append(f'--inputNorm={normal_file}')
    if color:
        cmd.append('--color=1')
    if reflectance:
        # reference: lib/metrics/pc_error_wrapper.py:53 (--lidar flag)
        cmd.append('--lidar=1')
    res = subprocess.run(cmd, capture_output=True, text=True)
    out = {}
    for line in res.stdout.splitlines():
        if ':' not in line:
            continue
        key, _, val = line.rpartition(':')
        key = key.strip()
        try:
            out[key] = float(val)
        except ValueError:
            continue
    if 'mse1      (p2point)' in out and 'mse2      (p2point)' in out:
        out['mse1+mse2 (p2point)'] = (out['mse1      (p2point)'] +
                                      out['mse2      (p2point)'])
    return out


_AVS_SECTION_START = '1. Take original point cloud as reference:'
_AVS_SECTION_SKIP = ('2. Take reconstruct point cloud as reference:',
                     '3. Symmetric result:')
_AVS_SECTION_END = 'Point cloud evalue processing time'


def avs_pc_evalue(infile1: str, infile2: str, resolution: float,
                  hausdorff: bool = False, color: bool = False,
                  reflectance: bool = False,
                  binary: str = '') -> Dict[str, float]:
    """Run the AVS ``pc_evalue`` binary and parse its sectioned stdout
    (reference: lib/metrics/pc_error_wrapper.py:110-156 — same CLI flags,
    same divider lines, same ``key: value`` metric harvest). Returns {} if
    no binary is available ($PC_EVALUE_BIN, like $PC_ERROR_BIN for
    mpeg_pc_error); raises if the binary ran but produced no metrics."""
    binary = binary or os.environ.get('PC_EVALUE_BIN', '')
    if not binary or not os.path.isfile(binary):
        return {}
    cmd = [binary, '-f1', infile1, '-f2', infile2,
           '--peakvalue', str(resolution - 1),
           '--show_hausdorff', '1' if hausdorff else '0']
    if color:
        cmd.append('-cc')
    if reflectance:
        cmd += ['-cr', '-rod', '8']
    res = subprocess.run(cmd, capture_output=True, text=True, check=True)
    out: Dict[str, float] = {}
    reading = False
    read_points = False
    for line in res.stdout.splitlines():
        if not read_points and line.startswith(' point cloud size: '):
            out['org points num'] = int(line.rstrip().rsplit(' ', 1)[-1])
            read_points = True
        elif line.startswith(_AVS_SECTION_START):
            reading = True
        elif line.startswith(_AVS_SECTION_SKIP):
            pass
        elif line.startswith(_AVS_SECTION_END):
            break
        elif reading and ':' in line:
            key, _, val = line.strip().partition(':')
            try:
                out[key.strip()] = float(val)
            except ValueError:
                continue
    if not out:
        raise RuntimeError(res.stdout)
    return out


def compute_color_psnr(pred: np.ndarray, pred_rgb: np.ndarray,
                       ref: np.ndarray, ref_rgb: np.ndarray) -> Dict[str, float]:
    """Symmetric YUV (BT.709) color PSNR over nearest-neighbor
    correspondences, reference pc_error schema keys c[0-3],PSNRF
    (reference: lib/metrics/pc_error_wrapper.py:98-100: weighted
    (6*Y + U + V) / 8 combined PSNR)."""
    from .misc import rgb_to_yuv_bt709
    pred = pred.astype(np.float64)
    ref = ref.astype(np.float64)
    yuv_pred = rgb_to_yuv_bt709(pred_rgb.astype(np.float64))
    yuv_ref = rgb_to_yuv_bt709(ref_rgb.astype(np.float64))
    _, idx_ab = _nn(pred, ref)
    _, idx_ba = _nn(ref, pred)
    out = {}
    psnrs = []
    for c in range(3):
        mse_ab = float(((yuv_pred[:, c] - yuv_ref[idx_ab, c]) ** 2).mean())
        mse_ba = float(((yuv_ref[:, c] - yuv_pred[idx_ba, c]) ** 2).mean())
        mse = max(mse_ab, mse_ba)
        peak2 = 255.0 ** 2 if np.abs(yuv_ref).max() > 1.5 else 1.0
        psnr = 10 * np.log10(peak2 / mse) if mse > 0 else float('inf')
        out[f'c[{c}],PSNRF'] = psnr
        psnrs.append(psnr)
    out['c[3],PSNRF'] = (6 * psnrs[0] + psnrs[1] + psnrs[2]) / 8
    return out


def compute_reflectance_psnr(pred: np.ndarray, pred_refl: np.ndarray,
                             ref: np.ndarray, ref_refl: np.ndarray,
                             peak: float = 255.0) -> Dict[str, float]:
    """Symmetric reflectance PSNR over nearest-neighbor correspondences.

    In-process analog of pc_error's --lidar=1 reflectance metric
    (reference: lib/metrics/pc_error_wrapper.py:42-53 passes
    ``--lidar={int(reflectance)}``); key follows the pc_error schema
    ('r,PSNRF', max-of-directions MSE like the color path)."""
    pred = pred.astype(np.float64)
    ref = ref.astype(np.float64)
    pr = pred_refl.astype(np.float64).reshape(-1)
    rr = ref_refl.astype(np.float64).reshape(-1)
    _, idx_ab = _nn(pred, ref)
    _, idx_ba = _nn(ref, pred)
    mse = max(float(((pr - rr[idx_ab]) ** 2).mean()),
              float(((rr - pr[idx_ba]) ** 2).mean()))
    return {'r,PSNRF': 10 * np.log10(peak ** 2 / mse) if mse > 0
            else float('inf')}
