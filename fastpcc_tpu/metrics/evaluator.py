"""PCCEvaluator: per-file logging of rate/latency/distortion + aggregation.

Mirrors the reference evaluator's schema and outputs
(reference: lib/evaluators.py:31-161): per-file entries keyed by file path
into metric_dict.json, means into mean_metric.json, reconstruction PLY and
bitstream written next to them. Distortion runs asynchronously in a process
pool (the reference uses a forkserver mp.Pool for pc_error; here the workers
run the scipy D1/D2 implementation, or the pc_error binary when configured).
"""
import concurrent.futures
import json
import os
import os.path as osp
from typing import Dict, Optional

import numpy as np

from .pc_error import compute_d1_d2_psnr, mpeg_pc_error
from ..data.ply_io import write_ply, read_ply


def _distortion_job(pred, file_path, resolution, compute_d2, pred_color,
                    pred_reflectance=None, use_avs=False, recon_path=None):
    data = read_ply(file_path) if file_path.endswith('.ply') else None
    if data is None:
        return {}
    ref = data['xyz']
    out = {}
    if use_avs and recon_path:
        # AVS pc_evalue variant (reference: lib/metrics/
        # pc_error_wrapper.py:110-156), $PC_EVALUE_BIN-gated
        from .pc_error import avs_pc_evalue
        out = avs_pc_evalue(file_path, recon_path, resolution,
                            color=pred_color is not None,
                            reflectance=pred_reflectance is not None)
    if not out and recon_path:
        out = mpeg_pc_error(file_path, recon_path, resolution,
                            color=pred_color is not None,
                            reflectance=pred_reflectance is not None)
    if not out:
        out = compute_d1_d2_psnr(pred, ref, resolution, compute_d2=compute_d2)
    if pred_color is not None and 'rgb' in data:
        from .pc_error import compute_color_psnr
        out.update(compute_color_psnr(pred, pred_color, ref, data['rgb']))
    if pred_reflectance is not None and 'reflectance' in data:
        from .pc_error import compute_reflectance_psnr
        out.update(compute_reflectance_psnr(pred, pred_reflectance, ref,
                                            data['reflectance']))
    return out


class PCCEvaluator:
    def __init__(self, cal_mpeg_pc_error: bool = True,
                 cal_avs_pc_evalue: bool = False, compute_d2: bool = True,
                 max_workers: Optional[int] = None):
        self.compute_distortion = cal_mpeg_pc_error or cal_avs_pc_evalue
        self.cal_avs_pc_evalue = cal_avs_pc_evalue
        self.compute_d2 = compute_d2
        self.metric_dict: Dict[str, Dict] = {}
        self._pool = None
        self._futures = {}
        # distortion must keep up with decode on multi-frame test sets — the
        # reference hides it behind a forkserver pool of N processes
        # (reference: lib/evaluators.py:42,67)
        self._max_workers = max_workers if max_workers \
            else min(4, os.cpu_count() or 1)

    def _ensure_pool(self):
        if self._pool is None:
            self._pool = concurrent.futures.ProcessPoolExecutor(
                max_workers=self._max_workers)
        return self._pool

    def log(self, pred: np.ndarray, org_points_num: int,
            compressed_bytes: bytes, file_path: str, resolution: float,
            results_dir: Optional[str] = None,
            extra_info_dict: Optional[Dict] = None,
            pred_color: Optional[np.ndarray] = None,
            pred_reflectance: Optional[np.ndarray] = None) -> Dict:
        entry = {
            'input_points_num': int(org_points_num),
            'output_points_num': int(len(pred)),
            'compressed_bytes': len(compressed_bytes),
            'bpp': len(compressed_bytes) * 8 / max(org_points_num, 1),
        }
        if extra_info_dict:
            entry.update(extra_info_dict)
        recon_path = None
        if results_dir:
            base = osp.splitext(osp.basename(file_path))[0]
            os.makedirs(results_dir, exist_ok=True)
            with open(osp.join(results_dir, base + '.bin'), 'wb') as f:
                f.write(compressed_bytes)
            recon_path = osp.join(results_dir, base + '_recon.ply')
            write_ply(recon_path, np.asarray(pred),
                      rgb=None if pred_color is None
                      else np.asarray(pred_color),
                      reflectance=None if pred_reflectance is None
                      else np.asarray(pred_reflectance))
        if self.compute_distortion and file_path.endswith('.ply') \
                and osp.isfile(file_path):
            fut = self._ensure_pool().submit(
                _distortion_job, np.asarray(pred, np.float64), file_path,
                resolution, self.compute_d2,
                None if pred_color is None else np.asarray(pred_color),
                None if pred_reflectance is None
                else np.asarray(pred_reflectance),
                self.cal_avs_pc_evalue, recon_path)
            self._futures[file_path] = fut
        self.metric_dict[file_path] = entry
        return entry

    def show(self, results_dir: Optional[str] = None) -> Dict:
        for file_path, fut in self._futures.items():
            try:
                self.metric_dict[file_path].update(fut.result())
            except Exception as e:  # pragma: no cover
                self.metric_dict[file_path]['distortion_error'] = str(e)
        self._futures.clear()
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

        mean: Dict[str, float] = {}
        keys = set()
        for entry in self.metric_dict.values():
            keys.update(k for k, v in entry.items()
                        if isinstance(v, (int, float)) and np.isfinite(v))
        for k in sorted(keys):
            vals = [e[k] for e in self.metric_dict.values()
                    if isinstance(e.get(k), (int, float)) and np.isfinite(e[k])]
            if vals:
                mean[k] = float(np.mean(vals))
        if results_dir:
            os.makedirs(results_dir, exist_ok=True)
            with open(osp.join(results_dir, 'metric_dict.json'), 'w') as f:
                json.dump(self.metric_dict, f, indent=2)
            with open(osp.join(results_dir, 'mean_metric.json'), 'w') as f:
                json.dump(mean, f, indent=2)
        return mean

    def reset(self):
        self.metric_dict = {}
        self._futures = {}
