"""ShapeNetCore v2: OBJ meshes -> uniform surface sampling -> voxelization,
with an npz cache keyed by the sampling config
(reference: lib/datasets/ShapeNetCorev2/dataset.py:64-153; OBJ parsing and
area-weighted triangle sampling are self-contained here instead of open3d).
"""
import hashlib
import os
import os.path as osp
from dataclasses import dataclass
from typing import Tuple

import numpy as np

from fastpcc_tpu.config import SimpleConfig
from ..base import DatasetBase


@dataclass
class Config(SimpleConfig):
    root: str = 'datasets/ShapeNetCore.v2'
    train_filelist_path: str = 'train_list_obj.txt'
    test_filelist_path: str = 'test_list_obj.txt'
    list_sampling_interval: int = 1
    mesh_sample_points_num: int = 500000
    mesh_sample_point_method: str = 'uniform'
    resolution: int = 128
    random_rotation: bool = False
    kd_tree_partition_max_points_num: int = 0
    gen_cache: bool = True
    cache_root: str = ''     # default: <root>/cache_<md5>


def load_obj_mesh(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ parser: vertices + triangulated faces."""
    verts, faces = [], []
    with open(path, errors='replace') as f:
        for line in f:
            if line.startswith('v '):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif line.startswith('f '):
                idx = [int(t.split('/')[0]) for t in line.split()[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):   # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def sample_mesh_uniform(verts: np.ndarray, faces: np.ndarray, n: int,
                        rng: np.random.Generator) -> np.ndarray:
    """Area-weighted uniform sampling on the triangle surface
    (replaces open3d's sample_points_uniformly,
    reference: lib/data_utils.py:364-378)."""
    tri = verts[faces]                                  # [F, 3, 3]
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=1)
    total = area.sum()
    if total <= 0:
        return verts[rng.integers(0, len(verts), n)]
    pick = rng.choice(len(faces), size=n, p=area / total)
    u = rng.random((n, 1))
    v = rng.random((n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    t = tri[pick]
    return t[:, 0] + u * (t[:, 1] - t[:, 0]) + v * (t[:, 2] - t[:, 0])


class Dataset(DatasetBase):
    def __init__(self, cfg: Config, is_training: bool, logger=None):
        super().__init__(cfg, is_training, logger)
        flist = osp.join(cfg.root, cfg.train_filelist_path if is_training
                         else cfg.test_filelist_path)
        if osp.exists(flist):
            with open(flist) as f:
                names = [line.strip() for line in
                         f.readlines()[::max(cfg.list_sampling_interval, 1)]]
        else:
            import glob
            names = sorted(osp.relpath(p, cfg.root) for p in glob.glob(
                osp.join(cfg.root, '*', '*', 'models',
                         'model_normalized.obj')))
        self.files = [osp.join(cfg.root, n) for n in names]
        key = hashlib.md5(
            f'{cfg.mesh_sample_points_num}_{cfg.mesh_sample_point_method}_'
            f'{cfg.resolution}'.encode()).hexdigest()[:10]
        self.cache_dir = cfg.cache_root or osp.join(cfg.root, f'cache_{key}')
        self.rng = np.random.default_rng()

    def __len__(self):
        return len(self.files)

    def _load_voxels(self, path: str) -> np.ndarray:
        cache = osp.join(self.cache_dir,
                         hashlib.md5(path.encode()).hexdigest() + '.npz')
        if osp.isfile(cache):
            return np.load(cache)['xyz']
        verts, faces = load_obj_mesh(path)
        pts = sample_mesh_uniform(verts, faces,
                                  self.cfg.mesh_sample_points_num,
                                  np.random.default_rng(0))
        lo, hi = pts.min(0), pts.max(0)
        scale = (self.cfg.resolution - 1) / max(float((hi - lo).max()), 1e-9)
        xyz = np.unique(np.round((pts - lo) * scale).astype(np.int32), axis=0)
        if self.cfg.gen_cache:
            os.makedirs(self.cache_dir, exist_ok=True)
            np.savez_compressed(cache, xyz=xyz)
        return xyz

    def __getitem__(self, index):
        path = self.files[index]
        xyz = self._load_voxels(path)
        if self.is_training and self.cfg.random_rotation:
            theta = self.rng.random(3) * 2 * np.pi
            cx, sx = np.cos(theta[0]), np.sin(theta[0])
            cz, sz = np.cos(theta[2]), np.sin(theta[2])
            rot = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]]) @ \
                np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
            c = xyz.mean(0)
            xyz = np.round((xyz - c) @ rot.T + c).astype(np.int32)
            xyz -= xyz.min(0)
            xyz = np.unique(np.clip(xyz, 0, self.cfg.resolution - 1), axis=0)
        if self.is_training:
            cap = self.cfg.kd_tree_partition_max_points_num
            if cap and len(xyz) > cap:
                from ...kd_partition import kd_tree_partition_randomly
                xyz = kd_tree_partition_randomly(xyz, cap, self.rng)
                xyz = xyz - xyz.min(0)
        return dict(xyz=xyz, file_path=path, org_points_num=len(xyz),
                    resolution=self.cfg.resolution)
