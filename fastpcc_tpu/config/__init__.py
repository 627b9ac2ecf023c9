from .simple_config import SimpleConfig
from .base import Config, TrainConfig, TestConfig

__all__ = ['SimpleConfig', 'Config', 'TrainConfig', 'TestConfig']
