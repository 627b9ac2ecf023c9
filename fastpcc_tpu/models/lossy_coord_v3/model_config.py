"""Config for lossy_coord_v3 (reference:
models/convolutional/lossy_coord_v3/model_config.py)."""
from dataclasses import dataclass
from typing import Tuple

from fastpcc_tpu.config import SimpleConfig


@dataclass
class Config(SimpleConfig):
    channels: int = 128
    compressed_channels: int = 1
    num_latents: Tuple[int, ...] = (0, 0, 2)      # per fine scale (stride2, 4, 8, ...)
    lossl_geo_upsample: Tuple[int, ...] = (0, 0, 0)  # 1: lossless, 0: lossy
    max_stride: int = 64
    latent_bound: int = 20

    coord_recon_loss_factor: float = 1.0
    warmup_steps: int = 0
    skip_top_scales_num: int = 0

    coord_bits: int = 12
    compute_dtype: str = 'bfloat16'
    em_tail_range: int = 32
    coder_lanes: int = 256
    cal_avs_pc_evalue: bool = False

    def check_local_value(self):
        import math
        d = int(math.log2(self.max_stride))
        assert d > len(self.num_latents)
        assert len(self.num_latents) == len(self.lossl_geo_upsample)
        # lossless flags must be monotone (fine lossy -> coarse lossless)
        first = next((i for i, v in enumerate(self.lossl_geo_upsample)
                      if v == 1), len(self.lossl_geo_upsample))
        assert all(v == 1 for v in self.lossl_geo_upsample[first:])
        assert all(v == 0 for v in self.num_latents[:max(first - 1, 0)])
