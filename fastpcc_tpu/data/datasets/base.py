"""Dataset base: every dataset module exports ``Dataset`` and ``Config``
(reference convention: lib/datasets/KITTIOdometry/__init__.py:1-2).

Datasets return per-sample dicts; ``collate_train``/``collate_test`` build
PCData batches (packed Morton codes for training, partition lists for
testing). A lightweight multi-worker prefetch loader lives in loader.py.
"""
from typing import Dict, List, Optional

import numpy as np

from ..pc_data import PCData, pc_batch_to_codes
from ..kd_partition import kd_tree_partition


class DatasetBase:
    def __init__(self, cfg, is_training: bool, logger=None):
        self.cfg = cfg
        self.is_training = is_training
        self.logger = logger

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index) -> Dict:
        raise NotImplementedError

    # -------------------------------------------------- collation

    def collate(self, samples: List[Dict], bits: int,
                partition_max_points: int = 0) -> PCData:
        if self.is_training:
            pc = pc_batch_to_codes([s['xyz'] for s in samples], bits)
        else:
            assert len(samples) == 1, 'test batch size must be 1'
            xyz = samples[0]['xyz']
            if partition_max_points and len(xyz) > partition_max_points:
                parts = kd_tree_partition(xyz, partition_max_points)
            else:
                parts = [xyz]
            pc = PCData(xyz_partitions=parts, batch_size=1)
        pc.file_path = [s.get('file_path', '') for s in samples]
        pc.resolution = [s.get('resolution', 0) for s in samples]
        pc.org_points_num = [s.get('org_points_num', len(s['xyz']))
                             for s in samples]
        invs = [s.get('inv_transform') for s in samples]
        if invs[0] is not None:
            pc.inv_transform = np.stack(invs)
        colors = [s.get('color') for s in samples]
        if colors[0] is not None:
            pc.color = colors if not self.is_training else colors
        return pc
