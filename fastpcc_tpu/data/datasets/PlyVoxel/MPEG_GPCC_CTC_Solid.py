"""MPEG G-PCC CTC Solid preset (reference:
lib/datasets/PlyVoxel/MPEG_GPCC_CTC_Solid.py:1-16)."""
from dataclasses import dataclass
from typing import Tuple, Union

from .dataset import Dataset  # noqa: F401  (module exports Dataset + Config)
from .dataset import Config as BaseDatasetConfig


@dataclass
class Config(BaseDatasetConfig):
    root: Union[str, Tuple[str, ...]] = (
        'datasets/MPEG_GPCC_CTC/Solid', 'datasets/MPEG_GPCC_CTC/Solid',
        'datasets/MPEG_GPCC_CTC/Solid',
    )
    filelist_path: Union[str, Tuple[str, ...]] = (
        'Solid_4096.txt', 'Solid_2048.txt', 'Solid_1024.txt',
    )
    resolution: Union[int, Tuple[int, ...]] = (4096, 2048, 1024)
