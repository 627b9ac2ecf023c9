"""Ablation: lossless coordinate model without feature propagation
(reference: models/convolutional/lossl_coord_wo_fea_prop/model.py:25-99).
Reuses the flagship with feature_propagation=False / fea_stride=2."""
from dataclasses import dataclass

from ..lossl_coord.model_config import Config as _BaseConfig
from ..lossl_coord.model import Model


@dataclass
class Config(_BaseConfig):
    feature_propagation: bool = False
    fea_stride: int = 2
