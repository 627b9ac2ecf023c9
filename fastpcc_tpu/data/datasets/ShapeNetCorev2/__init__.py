from .dataset import Dataset, Config
