"""MPEG G-PCC CTC Solid + MVUB preset (reference:
lib/datasets/PlyVoxel/MPEG_GPCC_CTC_Solid_MVUB.py:1-19)."""
from dataclasses import dataclass
from typing import Tuple, Union

from .dataset import Dataset  # noqa: F401
from .dataset import Config as BaseDatasetConfig


@dataclass
class Config(BaseDatasetConfig):
    root: Union[str, Tuple[str, ...]] = (
        'datasets/MPEG_GPCC_CTC/Solid', 'datasets/MPEG_GPCC_CTC/Solid',
        'datasets/MPEG_GPCC_CTC/Solid', 'datasets/MVUB',
    )
    filelist_path: Union[str, Tuple[str, ...]] = (
        'Solid_4096.txt', 'Solid_2048.txt', 'Solid_1024.txt', 'list.txt',
    )
    resolution: Union[int, Tuple[int, ...]] = (4096, 2048, 1024, 512)
