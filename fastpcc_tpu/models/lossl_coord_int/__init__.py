from .model import Model
from .quantize import convert, calibrate
from ..lossl_coord.model_config import Config
