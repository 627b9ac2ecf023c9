"""Config for lossy_coord_v2 (TMM'25 hierarchical distortion learning,
reference: models/convolutional/lossy_coord_v2/model_config.py)."""
from dataclasses import dataclass
from typing import Tuple

from fastpcc_tpu.config import SimpleConfig


@dataclass
class Config(SimpleConfig):
    activation: str = 'prelu'
    compressed_channels: Tuple[int, ...] = (1,)
    bottleneck_process: str = 'noise'
    bottleneck_value_bound: int = 20
    skip_encoding_fea: int = -1

    # normal part
    encoder_channels: Tuple[int, ...] = (16, 64)
    decoder_channels: Tuple[int, ...] = (16,)
    adaptive_pruning: bool = True
    adaptive_pruning_scaler: float = 1.0

    # geo lossless part
    geo_lossl_if_sample: Tuple[int, ...] = (0, 1, 0, 1, 0, 1)
    geo_lossl_channels: Tuple[int, ...] = (64, 128, 128, 128, 128, 128, 1)

    # loss
    bits_loss_factor: float = 0.4
    coord_recon_loss_factor: float = 1.0
    warmup_fea_loss_steps: int = 1
    warmup_fea_loss_factor: float = 0.4
    linear_warmup: bool = False

    coord_mode: str = 'learned'    # 'learned' (hyper-decoded masks) |
                                   # 'gpcc_raw' (scale-E coords coded raw or
                                   # via tmc3 when $TMC3_BIN is set; no coord
                                   # masks — the gpcc_lossy_coord_v2 variant,
                                   # reference: models/convolutional/
                                   # gpcc_lossy_coord_v2/model.py:20-208)
    coord_bits: int = 12
    compute_dtype: str = 'bfloat16'
    em_tail_range: int = 32        # training-bits EM support
    coder_lanes: int = 256
    geo_cap_shrink_log2: int = 1   # static cap halves per geo downsample

    def check_local_value(self):
        if len(self.compressed_channels) == 1:
            self.compressed_channels = tuple(
                self.compressed_channels) * len(self.geo_lossl_channels)
        assert len(self.geo_lossl_if_sample) == len(self.geo_lossl_channels) - 1
        assert len(self.compressed_channels) == len(self.geo_lossl_channels)
