"""Generate a SURROGATE dataset in real on-disk formats.

No real KITTI/Ford/8iVFB data is mounted in this environment, so RD evidence
runs on synthetic-but-realistically-formatted data, clearly labeled as such:

  * datasets/surrogate_kitti/sequences/{00,11}/velodyne/*.bin —
    KITTI-odometry layout, float32 [N, 4] (x, y, z, intensity) in meters,
    LiDAR-like ring geometry (the exact format KITTIOdometry.Dataset reads).
  * datasets/surrogate_plyvox/*.ply — voxelized PLYs with uint8 RGB
    (the PlyVoxel format, with_color-capable).

Numbers produced on this data are NOT comparable to published KITTI/8iVFB
tables; they prove the loaders, the train/test harness, and that training
improves the learned entropy model on held-out scans of the same source.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from fastpcc_tpu.data.datasets.Synthetic import synthetic_lidar_scan, \
    synthetic_surface
from fastpcc_tpu.data.ply_io import write_ply


def main(root='datasets'):
    rng = np.random.default_rng(0)
    # KITTI-format: train seq 00 (8 scans), test seq 11 (10 scans: steady-state eval evidence)
    for seq, n, base_seed in (('00', 8, 0), ('11', 10, 100)):
        d = os.path.join(root, 'surrogate_kitti', 'sequences', seq,
                         'velodyne')
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            xyz = synthetic_lidar_scan(seed=base_seed + i, resolution=65536)
            # voxel grid -> meters in the KITTI range (~[-200, 200])
            m = xyz.astype(np.float32) * (400.0 / 65536.0) - 200.0
            m += rng.normal(0, 0.002, m.shape).astype(np.float32)
            intensity = rng.random((len(m), 1)).astype(np.float32)
            np.concatenate([m, intensity], 1).astype('<f4').tofile(
                os.path.join(d, f'{i:06d}.bin'))
    # PlyVoxel-format with color
    d = os.path.join(root, 'surrogate_plyvox')
    os.makedirs(d, exist_ok=True)
    for i in range(4):
        xyz = synthetic_surface(seed=200 + i, n=60000, resolution=1024)
        xyz = np.unique(xyz, axis=0)
        rgb = (np.stack([xyz[:, 0] % 256, xyz[:, 1] % 256, xyz[:, 2] % 256],
                        1)).astype(np.uint8)
        write_ply(os.path.join(d, f'solid_{i}.ply'), xyz, rgb=rgb)
    print('surrogate dataset written under', root)


if __name__ == '__main__':
    main()
