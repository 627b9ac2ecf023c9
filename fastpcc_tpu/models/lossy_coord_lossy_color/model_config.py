"""Config for lossy_coord_lossy_color (TMM'25 joint geometry+color,
reference: models/convolutional/lossy_coord_lossy_color/model_config.py)."""
from dataclasses import dataclass
from typing import Tuple

from fastpcc_tpu.config import SimpleConfig


@dataclass
class Config(SimpleConfig):
    activation: str = 'relu'
    compressed_channels: Tuple[int, ...] = (1,)
    bottleneck_process: str = 'noise'
    bottleneck_value_bound: int = 20
    skip_encoding_fea: int = -1

    # normal part
    encoder_channels: Tuple[int, ...] = (8, 32)
    decoder_channels: Tuple[int, ...] = (8,)
    adaptive_pruning: bool = True
    adaptive_pruning_scaler: float = 1.0

    # geo lossless part
    geo_lossl_if_sample: Tuple[int, ...] = (1, 1)
    geo_lossl_channels: Tuple[int, ...] = (32, 64, 1)

    # loss
    use_yuv_loss: bool = False
    bits_loss_factor: float = 0.2
    coord_recon_loss_factor: float = 1.0
    color_recon_loss_factor: float = 1.0
    warmup_fea_loss_steps: int = 1
    warmup_color_loss_steps: int = 1
    warmup_fea_loss_factor: float = 0.2
    warmup_color_loss_factor: float = 1.0
    linear_warmup: bool = False

    recolor_k: int = 8             # KNN width of the recolor transfer
    coord_bits: int = 12
    compute_dtype: str = 'bfloat16'
    em_tail_range: int = 32
    coder_lanes: int = 256
    geo_cap_shrink_log2: int = 1
    coord_mode: str = 'learned'    # color model always codes coords itself

    def check_local_value(self):
        if len(self.compressed_channels) == 1:
            self.compressed_channels = tuple(
                self.compressed_channels) * len(self.geo_lossl_channels)
        assert len(self.geo_lossl_if_sample) == len(self.geo_lossl_channels) - 1
        assert len(self.compressed_channels) == len(self.geo_lossl_channels)
        assert self.encoder_channels[-1] == self.geo_lossl_channels[0] or True
