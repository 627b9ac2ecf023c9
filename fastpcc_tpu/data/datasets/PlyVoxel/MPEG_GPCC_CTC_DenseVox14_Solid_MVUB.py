"""MPEG G-PCC CTC Dense(14-bit) + Solid + MVUB preset (reference:
lib/datasets/PlyVoxel/MPEG_GPCC_CTC_DenseVox14_Solid_MVUB.py:1-20)."""
from dataclasses import dataclass
from typing import Tuple, Union

from .dataset import Dataset  # noqa: F401
from .dataset import Config as BaseDatasetConfig


@dataclass
class Config(BaseDatasetConfig):
    root: Union[str, Tuple[str, ...]] = (
        'datasets/MPEG_GPCC_CTC/Dense',
        'datasets/MPEG_GPCC_CTC/Solid', 'datasets/MPEG_GPCC_CTC/Solid',
        'datasets/MPEG_GPCC_CTC/Solid', 'datasets/MVUB',
    )
    filelist_path: Union[str, Tuple[str, ...]] = (
        'Dense_16384.txt',
        'Solid_4096.txt', 'Solid_2048.txt', 'Solid_1024.txt', 'list.txt',
    )
    resolution: Union[int, Tuple[int, ...]] = (16384, 4096, 2048, 1024, 512)
