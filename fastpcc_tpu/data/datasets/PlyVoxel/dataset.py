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


def _as_tuple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,)


class Dataset(DatasetBase):
    def __init__(self, cfg: Config, is_training: bool, logger=None):
        super().__init__(cfg, is_training, logger)
        roots = _as_tuple(cfg.root)
        lists = _as_tuple(cfg.filelist_path)
        resolutions = _as_tuple(cfg.resolution)
        scalers = _as_tuple(cfg.coord_scaler)
        self.files = []
        for i, root in enumerate(roots):
            flist = lists[min(i, len(lists) - 1)]
            res = resolutions[min(i, len(resolutions) - 1)]
            sc = scalers[min(i, len(scalers) - 1)]
            if flist:
                with open(osp.join(root, flist)) as f:
                    names = [line.strip() for line in
                             f.readlines()[::max(cfg.list_sampling_interval, 1)]]
            else:
                names = sorted(osp.relpath(p, root) for p in
                               glob.glob(osp.join(root, '**', '*.ply'),
                                         recursive=True))
            self.files += [(osp.join(root, n), res, sc) for n in names]
        self.rng = np.random.default_rng()

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index):
        path, resolution, scaler = self.files[index]
        data = read_ply(path)
        xyz = data['xyz'].astype(np.float64)
        org_points_num = len(xyz)
        if scaler != 1.0:
            xyz = xyz * scaler
        xyz = np.round(xyz).astype(np.int32)
        xyz, uniq_idx = np.unique(xyz, axis=0, return_index=True)

        sample = dict(xyz=xyz, file_path=path,
                      org_points_num=org_points_num,
                      resolution=int(round(resolution * scaler))
                      if scaler != 1.0 else resolution,
                      inv_transform=np.array([0, 0, 0, 1 / scaler], np.float32)
                      if scaler != 1.0 else None)
        if self.cfg.with_color and 'rgb' in data:
            sample['color'] = data['rgb'][uniq_idx]
        if self.cfg.with_reflectance and 'reflectance' in data:
            sample['reflectance'] = data['reflectance'][uniq_idx]

        if self.is_training and self.cfg.random_flip:
            for ax in range(3):
                if self.rng.random() > 0.5:
                    xyz[:, ax] = xyz[:, ax].max() - xyz[:, ax]
            sample['xyz'] = xyz
        if self.is_training:
            cap = self.cfg.kd_tree_partition_max_points_num
            cap = cap[0] if isinstance(cap, (tuple, list)) else cap
            if cap and len(xyz) > cap:
                from ...kd_partition import kd_tree_partition_randomly_idx
                idx = kd_tree_partition_randomly_idx(xyz, cap, self.rng)
                sample['xyz'] = xyz[idx]
                for key in ('color', 'reflectance'):
                    if key in sample:
                        sample[key] = sample[key][idx]
        return sample
