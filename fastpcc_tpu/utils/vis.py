"""Matplotlib point-cloud / voxel debug plots (reference: lib/vis.py:12-85;
the reference also uses open3d windows — headless matplotlib only here)."""
from typing import Optional

import numpy as np


def plot_point_cloud(xyz: np.ndarray, color: Optional[np.ndarray] = None,
                     save_path: str = 'pc.png', point_size: float = 0.5,
                     title: str = ''):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection='3d')
    c = None
    if color is not None:
        c = np.asarray(color, np.float64)
        if c.max() > 1.5:
            c = c / 255.0
    ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], s=point_size, c=c)
    ax.set_box_aspect(np.ptp(xyz, axis=0))
    if title:
        ax.set_title(title)
    fig.savefig(save_path, dpi=150, bbox_inches='tight')
    plt.close(fig)
    return save_path


def plot_compare(a: np.ndarray, b: np.ndarray, save_path: str = 'cmp.png'):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(16, 8))
    for i, (pts, name) in enumerate(((a, 'original'), (b, 'reconstruction'))):
        ax = fig.add_subplot(1, 2, i + 1, projection='3d')
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.5)
        ax.set_title(name)
        ax.set_box_aspect(np.ptp(pts, axis=0))
    fig.savefig(save_path, dpi=150, bbox_inches='tight')
    plt.close(fig)
    return save_path
