"""kd-tree spatial partitioning (host-side numpy).

The domain's analog of sequence parallelism: huge clouds are split into
independently coded chunks (reference: lib/data_utils.py:187-283). Splits on
the max-variance axis at the median until every part is under the cap.
"""
from typing import List

import numpy as np


def _split(xyz: np.ndarray, indices: np.ndarray, max_num: int,
           out: List[np.ndarray]):
    if len(indices) <= max_num:
        out.append(indices)
        return
    pts = xyz[indices]
    axis = int(np.argmax(pts.var(axis=0)))
    order = np.argsort(pts[:, axis], kind='stable')
    mid = len(order) // 2
    _split(xyz, indices[order[:mid]], max_num, out)
    _split(xyz, indices[order[mid:]], max_num, out)


def kd_tree_partition(xyz: np.ndarray, max_num: int) -> List[np.ndarray]:
    """Partition [N, D] points into chunks of <= max_num points each."""
    return [xyz[idx] for idx in kd_tree_partition_idx(xyz, max_num)]


def kd_tree_partition_idx(xyz: np.ndarray, max_num: int) -> List[np.ndarray]:
    """Same split, but return index arrays (lets callers carry per-point
    attributes such as RGB through the partition)."""
    if len(xyz) <= max_num:
        return [np.arange(len(xyz))]
    out: List[np.ndarray] = []
    _split(xyz, np.arange(len(xyz)), max_num, out)
    return out


def kd_tree_partition_randomly(xyz: np.ndarray, max_num: int,
                               rng: np.random.Generator) -> np.ndarray:
    """Training-time random crop: walk the kd-tree picking a random side until
    the part fits (reference: lib/data_utils.py:237-283)."""
    return xyz[kd_tree_partition_randomly_idx(xyz, max_num, rng)]


def kd_tree_partition_randomly_idx(xyz: np.ndarray, max_num: int,
                                   rng: np.random.Generator) -> np.ndarray:
    """Index-returning variant (keeps per-point attributes aligned)."""
    indices = np.arange(len(xyz))
    while len(indices) > max_num:
        pts = xyz[indices]
        axis = int(np.argmax(pts.var(axis=0)))
        order = np.argsort(pts[:, axis], kind='stable')
        mid = len(order) // 2
        half = order[:mid] if rng.random() < 0.5 else order[mid:]
        indices = indices[half]
    return indices
