"""Generic voxelized-PLY dataset (8iVFBv2 / Owlii / MVUB-style).

Behavioral parity with the reference loader
(reference: lib/datasets/PlyVoxel/Base/dataset.py:39-262): multiple roots
with per-root filelists and resolutions, optional color/reflectance, a
per-batch coordinate scaler, flips, and kd-tree partition caps. Subclass
presets (MPEG CTC Solid/Dense etc., reference: lib/datasets/PlyVoxel/
MPEG_GPCC_CTC_Solid.py:1-16) are plain configs here.
"""
import glob
import os.path as osp
import re
from dataclasses import dataclass, field
from typing import Tuple, Union

import numpy as np

from fastpcc_tpu.config import SimpleConfig
from ..base import DatasetBase
from ...ply_io import read_ply


@dataclass
class Config(SimpleConfig):
    root: Union[str, Tuple[str, ...]] = ''
    filelist_path: Union[str, Tuple[str, ...]] = ''   # '' -> glob *.ply
    resolution: Union[int, Tuple[int, ...]] = 1024
    coord_scaler: Union[float, Tuple[float, ...]] = 1.0
    with_color: bool = False
    with_reflectance: bool = False
    random_flip: bool = False
    kd_tree_partition_max_points_num: Union[int, Tuple[int, ...]] = 0
    list_sampling_interval: int = 1
    # inter-frame coding: load the N preceding frames of the sequence (by
    # decrementing the last digit-run in the file name) as reference frames
    # (reference: lib/datasets/PlyVoxel/Base/dataset.py:74-135)
    ref_frames_num: int = 0


def _as_tuple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,)


class Dataset(DatasetBase):
    def __init__(self, cfg: Config, is_training: bool, logger=None):
        super().__init__(cfg, is_training, logger)
        roots = _as_tuple(cfg.root)
        lists = _as_tuple(cfg.filelist_path)
        resolutions = _as_tuple(cfg.resolution)
        scalers = _as_tuple(cfg.coord_scaler)
        caps = _as_tuple(cfg.kd_tree_partition_max_points_num)
        self.files = []
        for i, root in enumerate(roots):
            flist = lists[min(i, len(lists) - 1)]
            res = resolutions[min(i, len(resolutions) - 1)]
            sc = scalers[min(i, len(scalers) - 1)]
            cap = caps[min(i, len(caps) - 1)]
            if flist:
                with open(osp.join(root, flist)) as f:
                    names = [line.strip() for line in
                             f.readlines()[::max(cfg.list_sampling_interval, 1)]]
            else:
                names = sorted(osp.relpath(p, root) for p in
                               glob.glob(osp.join(root, '**', '*.ply'),
                                         recursive=True))
            # partition cap rides per root/subset, like resolution and
            # scaler (reference: Base/dataset.py:39-41,58-68 — per-file
            # file_partition_max_points_num_list)
            self.files += [(osp.join(root, n), res, sc, cap) for n in names]
        self.rng = np.random.default_rng()

    def __len__(self):
        return len(self.files)

    @staticmethod
    def ref_frame_paths(path: str, ref_frames_num: int):
        """Paths of the ``ref_frames_num`` frames preceding ``path`` in its
        sequence, oldest first; None where the frame does not exist. The
        frame index is the LAST run of digits in the path (reference:
        lib/datasets/PlyVoxel/Base/dataset.py:80-95)."""
        m = re.search(r'(\d+)', path[::-1])
        if m is None:
            return (None,) * ref_frames_num
        start, end = m.start(0), m.end(0)
        idx_str = path[len(path) - end:len(path) - start]
        cur = int(idx_str)
        out = []
        for i in range(ref_frames_num, 0, -1):
            ref = cur - i
            p = (f'{path[:len(path) - end]}{ref:0{len(idx_str)}d}'
                 f'{path[len(path) - start:]}')
            out.append(p if ref >= 0 and osp.isfile(p) else None)
        return tuple(out)

    def _load_voxelized(self, path, scaler):
        """Read + scale + round one PLY; returns (int xyz, uniq_idx, data)."""
        data = read_ply(path)
        xyz = data['xyz'].astype(np.float64)
        if scaler != 1.0:
            xyz = xyz * scaler
        xyz = np.round(xyz).astype(np.int32)
        xyz, uniq_idx = np.unique(xyz, axis=0, return_index=True)
        return xyz, uniq_idx, data

    def __getitem__(self, index):
        path, resolution, scaler, par_cap = self.files[index]
        data = read_ply(path)
        xyz = data['xyz'].astype(np.float64)
        org_points_num = len(xyz)
        if scaler != 1.0:
            xyz = xyz * scaler
        xyz = np.round(xyz).astype(np.int32)
        xyz, uniq_idx = np.unique(xyz, axis=0, return_index=True)

        sample = dict(xyz=xyz, file_path=path,
                      org_points_num=org_points_num,
                      partition_cap=par_cap,
                      resolution=int(round(resolution * scaler))
                      if scaler != 1.0 else resolution,
                      inv_transform=np.array([0, 0, 0, 1 / scaler], np.float32)
                      if scaler != 1.0 else None)
        if self.cfg.with_color and 'rgb' in data:
            sample['color'] = data['rgb'][uniq_idx]
        if self.cfg.with_reflectance and 'reflectance' in data:
            sample['reflectance'] = data['reflectance'][uniq_idx]

        if self.cfg.ref_frames_num > 0:
            refs = self.ref_frame_paths(path, self.cfg.ref_frames_num)
            xyzt, c_ref, r_ref = [], [], []
            for ref_idx, rp in enumerate(refs):
                if rp is None:
                    continue
                rxyz, ridx, rdata = self._load_voxelized(rp, scaler)
                if self.cfg.ref_frames_num > 1:
                    # 4th column = which reference frame, as in the
                    # reference's xyzt layout (Base/dataset.py:127-130)
                    rxyz = np.pad(rxyz, ((0, 0), (0, 1)),
                                  constant_values=ref_idx)
                xyzt.append(rxyz)
                if self.cfg.with_color and 'rgb' in rdata:
                    c_ref.append(rdata['rgb'][ridx])
                if self.cfg.with_reflectance and 'reflectance' in rdata:
                    r_ref.append(rdata['reflectance'][ridx])
            if xyzt:
                sample['xyzt_ref'] = np.concatenate(xyzt, axis=0)
                if c_ref:
                    sample['color_ref'] = np.concatenate(c_ref, axis=0)
                if r_ref:
                    sample['reflectance_ref'] = np.concatenate(r_ref, axis=0)

        if self.is_training and self.cfg.random_flip:
            for ax in range(3):
                if self.rng.random() > 0.5:
                    xyz[:, ax] = xyz[:, ax].max() - xyz[:, ax]
            sample['xyz'] = xyz
        if self.is_training:
            cap = par_cap
            if cap and len(xyz) > cap:
                from ...kd_partition import kd_tree_partition_randomly_idx
                idx = kd_tree_partition_randomly_idx(xyz, cap, self.rng)
                sample['xyz'] = xyz[idx]
                for key in ('color', 'reflectance'):
                    if key in sample:
                        sample[key] = sample[key][idx]
        return sample
