"""Ablation: lossless coordinate model without feature propagation
(reference: models/convolutional/lossl_coord_wo_fea_prop/model.py:25-137).
Reuses the flagship with feature_propagation=False; multi-step
re-densification chains are kept (their dec consumes only the bins embed).
The wo_redens configuration additionally sets fea_stride=2
(reference: config/convolutional/lossl_coord/kitti_ford_wo_fea_prop_wo_redens.yaml)."""
from dataclasses import dataclass

from ..lossl_coord.model_config import Config as _BaseConfig
from ..lossl_coord.model import Model


@dataclass
class Config(_BaseConfig):
    feature_propagation: bool = False
