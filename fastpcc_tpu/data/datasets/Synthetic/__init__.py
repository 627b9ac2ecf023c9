from .dataset import Dataset, Config, synthetic_lidar_scan, synthetic_surface
