from .model_config import Config

try:
    from .model import Model
except ImportError:  # pragma: no cover
    Model = None
