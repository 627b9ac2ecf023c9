"""PlyVoxel.Base — module-path alias matching the reference layout
(reference: lib/datasets/PlyVoxel/Base/__init__.py), so configs can set
``dataset_module_path: fastpcc_tpu.data.datasets.PlyVoxel.Base``."""
from ..dataset import Dataset, Config

__all__ = ['Dataset', 'Config']
