"""Batch container + collation for point-cloud samples.

Host-side analog of the reference's PCData (reference: lib/data_utils.py:26-161).
Collation packs each sample's integer coords into sorted (batch | Morton)
codes padded to a static bucket — the TPU replacement for the reference's
N x 4 batched-coordinate tensors, chosen so jitted programs see stable shapes.
"""
import dataclasses
import math
from typing import List, Optional, Sequence, Union

import numpy as np

from ..ops.morton import np_morton_encode


@dataclasses.dataclass
class PCData:
    """One batch. xyz is either a packed code array (training) or a list of
    per-partition integer coord arrays (testing with kd partition)."""
    codes: Optional[np.ndarray] = None        # [cap] int64 sorted, padded
    count: int = 0                            # valid entries in codes
    points_num: Optional[np.ndarray] = None   # [B] per-sample counts
    xyz_partitions: Optional[List[np.ndarray]] = None  # test-time partitions
    color: Optional[np.ndarray] = None
    reflectance: Optional[np.ndarray] = None
    # inter-frame fields (reference: lib/data_utils.py:44-67): previous
    # frame(s) of a sequence, concatenated; when more than one reference
    # frame is configured, xyzt_ref carries a 4th column = ref-frame index.
    xyzt_ref: Optional[np.ndarray] = None
    color_ref: Optional[np.ndarray] = None
    reflectance_ref: Optional[np.ndarray] = None
    file_path: Sequence[str] = ()
    resolution: Sequence[int] = ()
    org_points_num: Sequence[int] = ()
    inv_transform: Optional[np.ndarray] = None  # [4]: xyz offset + scale
    batch_size: int = 1
    training_step: int = 0
    results_dir: Optional[str] = None


def _bucket(n: int, minimum: int = 1024) -> int:
    return max(1 << math.ceil(math.log2(max(n, 1))), minimum)


def pc_batch_to_codes(xyz_list: List[np.ndarray], bits: int,
                      feats_list: Optional[List[np.ndarray]] = None) -> PCData:
    """Pack a list of per-sample integer coords into one sorted padded code
    array with the batch index in the high bits. feats_list (e.g. RGB)
    rides along, reordered/deduplicated consistently with the codes."""
    codes_list = []
    feats_out = []
    points_num = []
    for b, xyz in enumerate(xyz_list):
        raw = np_morton_encode(xyz.astype(np.int64))
        c, first = np.unique(raw, return_index=True)
        codes_list.append(c | (np.int64(b) << (3 * bits)))
        if feats_list is not None:
            feats_out.append(feats_list[b][first])
        points_num.append(len(c))
    codes = np.concatenate(codes_list)
    # per-sample blocks are internally sorted and batch-major -> already sorted
    cap = _bucket(len(codes))
    padded = np.full((cap,), (1 << 62), np.int64)
    padded[:len(codes)] = codes
    color = None
    if feats_list is not None:
        f = np.concatenate(feats_out).astype(np.float32)
        color = np.zeros((cap, f.shape[1]), np.float32)
        color[:len(codes)] = f
    return PCData(codes=padded, count=len(codes),
                  points_num=np.asarray(points_num, np.float32),
                  color=color, batch_size=len(xyz_list))
