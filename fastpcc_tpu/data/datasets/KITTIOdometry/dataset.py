"""KITTI Odometry LiDAR dataset (+ optional exterior PLY root, e.g. Ford).

Behavioral parity with the reference loader
(reference: lib/datasets/KITTIOdometry/dataset.py:15-145): .bin float32
scans quantized with scale (resolution-1)/400, unique-voxel dedup, optional
z-rotation / flips / random kd crop for training, normal-cache PLY
generation for pc_error, and the inv_transform round trip.
"""
import os.path as osp
import pathlib
from dataclasses import dataclass
from typing import Tuple

import numpy as np

from fastpcc_tpu.config import SimpleConfig
from ..base import DatasetBase
from ...ply_io import read_ply, write_ply


@dataclass
class Config(SimpleConfig):
    root: str = 'datasets/KITTI/odometry/dataset/sequences'
    train_filelist_path: str = 'train_list_kitti.txt'
    test_filelist_path: str = 'test_list_kitti.txt'
    train_subset_index: Tuple[int, ...] = tuple(range(11))
    test_subset_index: Tuple[int, ...] = (11,)
    list_sampling_interval: int = 1
    ply_list_sampling_interval: int = 0
    ply_file_root: str = ''
    ply_file_train_filelist_path: str = 'train_list_ford.txt'
    ply_file_test_filelist_path: str = 'test_list_ford.txt'
    ply_file_coord_scaler: float = 1.0
    ply_file_resolution: int = 30001

    resolution: int = 65536
    random_rotation: bool = False
    random_flip: bool = False
    kd_tree_partition_max_points_num: int = 0
    morton_sort: bool = True           # collation always Morton-sorts; kept
    morton_sort_inverse: bool = True   # for config compatibility
    flag_sparsepcgc: bool = False      # 1mm-quantization compatibility mode


class Dataset(DatasetBase):
    def __init__(self, cfg: Config, is_training: bool, logger=None):
        super().__init__(cfg, is_training, logger)
        if is_training:
            filelist = osp.join(cfg.root, cfg.train_filelist_path)
            ply_filelist = osp.join(cfg.ply_file_root,
                                    cfg.ply_file_train_filelist_path) \
                if cfg.ply_file_root else ''
            subsets = cfg.train_subset_index
        else:
            filelist = osp.join(cfg.root, cfg.test_filelist_path)
            ply_filelist = osp.join(cfg.ply_file_root,
                                    cfg.ply_file_test_filelist_path) \
                if cfg.ply_file_root else ''
            subsets = cfg.test_subset_index

        if osp.exists(filelist):
            self.file_list = self._load_filelist(cfg.root, filelist,
                                                 cfg.list_sampling_interval)
        else:
            self.file_list = self._gen_filelist(filelist, subsets)
        if ply_filelist and osp.exists(ply_filelist):
            interval = (cfg.ply_list_sampling_interval
                        or cfg.list_sampling_interval)
            self.file_list += self._load_filelist(cfg.ply_file_root,
                                                  ply_filelist, interval)
        self.rng = np.random.default_rng()

    def _gen_filelist(self, filelist_path, subsets):
        files = []
        for idx in subsets:
            sub = sorted(str(p.relative_to(self.cfg.root)) for p in
                         pathlib.Path(self.cfg.root).glob(f'{idx:02d}/velodyne/*.bin'))
            files.extend(sub)
        if files:
            with open(filelist_path, 'w') as f:
                f.writelines(x + '\n' for x in files)
        return [osp.join(self.cfg.root, x) for x in files]

    @staticmethod
    def _load_filelist(root, path, interval):
        with open(path) as f:
            return [osp.join(root, line.strip())
                    for line in f.readlines()[::max(interval, 1)]]

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, index):
        path = self.file_list[index]
        is_bin = path.endswith('bin')
        if is_bin:
            xyz = np.fromfile(path, '<f4').reshape(-1, 4)[:, :3]
        else:
            xyz = read_ply(path)['xyz'].astype(np.float32)
        org_points_num = len(xyz)

        file_path = path
        if not self.is_training and is_bin:
            # normal-free cache PLY for pc_error D1 (D2 needs normals; the
            # evaluator regenerates with normals when requested)
            p, n = osp.split(path)
            if not self.cfg.flag_sparsepcgc:
                cache = osp.join(p, n.replace('.bin', '_n.ply'))
                if not osp.isfile(cache):
                    write_ply(cache, xyz)
            else:
                cache = osp.join(p, n.replace('.bin', '_q1mm_n.ply'))
                if not osp.isfile(cache):
                    write_ply(cache, np.unique((xyz * 1000).round(), axis=0))
            file_path = cache

        if is_bin:
            scale = (self.cfg.resolution - 1) / 400
            inv_scale = 400 / (self.cfg.resolution - 1)
        else:
            scale = self.cfg.ply_file_coord_scaler
            inv_scale = 1 / scale

        if self.is_training and self.cfg.random_rotation:
            theta = self.rng.random() * 2 * np.pi
            c, s = np.cos(theta), np.sin(theta)
            rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
            xyz = xyz @ rot.T

        org_point = xyz.min(0)
        xyz = np.unique(((xyz - org_point) * scale).round().astype(np.int32),
                        axis=0)

        if self.is_training:
            cap = self.cfg.kd_tree_partition_max_points_num
            if cap and len(xyz) > cap:
                from ...kd_partition import kd_tree_partition_randomly
                xyz = kd_tree_partition_randomly(xyz, cap, self.rng)
                crop_org = xyz.min(0)
                xyz = xyz - crop_org
                org_point = org_point + crop_org * inv_scale
            if self.cfg.random_flip:
                if self.rng.random() > 0.5:
                    xyz[:, 0] = xyz[:, 0].max() - xyz[:, 0]
                if self.rng.random() > 0.5:
                    xyz[:, 1] = xyz[:, 1].max() - xyz[:, 1]

        inv_transform = np.concatenate(
            [org_point.reshape(-1), [inv_scale]]).astype(np.float32)
        if is_bin and not self.cfg.flag_sparsepcgc:
            resolution = 59.70 + 1
        elif is_bin:
            resolution = 30001
            inv_transform = inv_transform * 1000
        else:
            resolution = self.cfg.ply_file_resolution
        return dict(xyz=xyz, file_path=file_path,
                    org_points_num=org_points_num, resolution=resolution,
                    inv_transform=inv_transform)
