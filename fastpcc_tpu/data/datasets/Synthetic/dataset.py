"""Synthetic point-cloud dataset: KITTI-like spinning-LiDAR scans and dense
surface clouds. Used for tests and benchmarks when no real data is mounted;
implements the same Dataset/Config module contract as the real datasets.
"""
from dataclasses import dataclass

import numpy as np

from fastpcc_tpu.config import SimpleConfig
from ..base import DatasetBase


def synthetic_lidar_scan(seed: int = 0, n_beams: int = 64,
                         n_azimuth: int = 2200, resolution: int = 65536,
                         dropout: float = 0.15) -> np.ndarray:
    """A 64-beam spinning-LiDAR-like scan quantized to a voxel grid, roughly
    matching KITTI statistics (~120k unique voxels at resolution 65536 with
    the reference's scale = (resolution-1)/400 over a 400 m box)."""
    rng = np.random.default_rng(seed)
    elev = np.deg2rad(np.linspace(-24.8, 2.0, n_beams))
    azim = np.linspace(0, 2 * np.pi, n_azimuth, endpoint=False)
    e, a = np.meshgrid(elev, azim, indexing='ij')
    # range field: smooth terrain + objects + noise
    base = 8.0 + 60.0 * rng.random()
    r = base / np.maximum(np.abs(np.sin(e)), 0.08)
    bumps = 10 * np.sin(3 * a + rng.random() * 7) * np.cos(2 * e)
    r = np.clip(r + bumps + rng.normal(0, 0.05, r.shape), 2.0, 120.0)
    keep = rng.random(r.shape) > dropout
    x = (r * np.cos(e) * np.cos(a))[keep]
    y = (r * np.cos(e) * np.sin(a))[keep]
    z = (r * np.sin(e))[keep]
    xyz = np.stack([x, y, z], axis=1)
    scale = (resolution - 1) / 400
    q = ((xyz - xyz.min(0)) * scale).round().astype(np.int32)
    return np.unique(q, axis=0)


def synthetic_surface(seed: int = 0, n: int = 200_000,
                      resolution: int = 1024) -> np.ndarray:
    """Dense solid-surface-like cloud (8iVFBv2-style density)."""
    rng = np.random.default_rng(seed)
    u, v = rng.random(n), rng.random(n)
    theta, phi = 2 * np.pi * u, np.arccos(2 * v - 1)
    r = 0.35 * (1 + 0.12 * np.sin(5 * theta) * np.sin(4 * phi))
    x = r * np.sin(phi) * np.cos(theta) + 0.5
    y = r * np.sin(phi) * np.sin(theta) + 0.5
    z = r * np.cos(phi) + 0.5
    xyz = np.stack([x, y, z], axis=1) * (resolution - 1)
    return np.unique(xyz.round().astype(np.int32), axis=0)


def synthetic_colors(xyz: np.ndarray, seed: int = 0) -> np.ndarray:
    """Smooth procedural RGB (uint8) over a point set — a stand-in for
    photographed vertex colors when no real colored data is mounted."""
    rng = np.random.default_rng(seed)
    p = xyz.astype(np.float64)
    p = p / max(p.max(), 1.0)
    phase = rng.random(3) * 6.28
    freq = 2.0 + 3.0 * rng.random(3)
    r = 0.5 + 0.5 * np.sin(freq[0] * p[:, 0] + 2 * p[:, 1] + phase[0])
    g = 0.5 + 0.5 * np.sin(freq[1] * p[:, 1] + 2 * p[:, 2] + phase[1])
    b = 0.5 + 0.5 * np.sin(freq[2] * p[:, 2] + 2 * p[:, 0] + phase[2])
    return np.clip(np.stack([r, g, b], 1) * 255, 0, 255).astype(np.uint8)


@dataclass
class Config(SimpleConfig):
    kind: str = 'lidar'          # 'lidar' | 'surface'
    num_samples: int = 8
    resolution: int = 65536
    kd_tree_partition_max_points_num: int = 0
    with_color: bool = False
    seed: int = 0


class Dataset(DatasetBase):
    def __init__(self, cfg: Config, is_training: bool, logger=None):
        super().__init__(cfg, is_training, logger)

    def __len__(self):
        return self.cfg.num_samples

    def __getitem__(self, index):
        seed = self.cfg.seed + index + (10_000 if self.is_training else 0)
        if self.cfg.kind == 'lidar':
            xyz = synthetic_lidar_scan(seed, resolution=self.cfg.resolution)
            resolution = 59.70 + 1
        else:
            xyz = synthetic_surface(seed, resolution=self.cfg.resolution)
            resolution = self.cfg.resolution
        if self.is_training:
            cap = self.cfg.kd_tree_partition_max_points_num
            if cap and len(xyz) > cap:
                from ...kd_partition import kd_tree_partition_randomly
                xyz = kd_tree_partition_randomly(
                    xyz, cap, np.random.default_rng(seed))
                xyz = xyz - xyz.min(0)
        out = dict(xyz=xyz, file_path=f'synthetic_{index}.bin',
                   org_points_num=len(xyz), resolution=resolution)
        if self.cfg.with_color:
            rgb = synthetic_colors(xyz, seed)
            out['rgb'] = rgb
            out['color'] = rgb
        return out
