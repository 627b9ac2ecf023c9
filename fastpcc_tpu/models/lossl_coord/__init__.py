from .model_config import Config

try:  # Model import requires jax; keep Config importable standalone
    from .model import Model
except ImportError:  # pragma: no cover
    Model = None
