"""gpcc_lossy_coord_v2 — lossy_coord_v2 with G-PCC-coded coordinates
(reference: models/convolutional/gpcc_lossy_coord_v2/model.py:20-208): the
scale-E geometry is coded losslessly by tmc3 (or the self-contained raw
coder when $TMC3_BIN is absent); every coarser grid derives from it, so no
occupancy-mask streams exist — only the feature residual chain."""
from dataclasses import dataclass

from ..lossy_coord_v2.model import Model
from ..lossy_coord_v2.model_config import Config as _V2Config


@dataclass
class Config(_V2Config):
    coord_mode: str = 'gpcc_raw'
