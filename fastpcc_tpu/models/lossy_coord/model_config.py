"""Config for the lossy-coordinate model (PCGCv2 reimplementation baseline,
reference: models/convolutional/lossy_coord/model_config.py + baseline.yaml)."""
from dataclasses import dataclass
from typing import Tuple

from fastpcc_tpu.config import SimpleConfig


@dataclass
class Config(SimpleConfig):
    basic_block_type: str = 'InceptionResBlock'   # or 'ResBlock'
    basic_block_num: int = 3
    compressed_channels: int = 8
    encoder_channels: Tuple[int, ...] = (4, 16, 64, 64)
    decoder_channels: Tuple[int, ...] = (64, 16, 4)
    coord_recon_loss_type: str = 'BCE'   # 'BCE' | 'Dist' (knn sq-dist regression)
    dist_upper_bound: float = 2.0
    coord_recon_loss_factor: float = 1.0
    adaptive_pruning: bool = True
    adaptive_pruning_num_scaler: float = 1.0
    bpp_loss_factor: float = 0.3
    warmup_steps: int = 1000
    warmup_bpp_loss_factor: float = 0.01

    coord_bits: int = 18
    compute_dtype: str = 'bfloat16'
    em_mode: str = 'factorized'     # 'factorized' | 'hyperprior' | 'lossless_based'
                                    # (reference init_em modes, model.py:126-192,
                                    #  and the recurrent lossless-based EM,
                                    #  geo_lossl_em.py:20-400)
    hyper_channels: int = 8
    hyper_net: str = 'conv'         # 'conv' (reference sparse-conv hyper
                                    # nets, model.py:126-192) | 'mlp'
    hyper_encoder_channels: Tuple[int, ...] = (16, 16, 16, 16)
    hyper_decoder_channels: Tuple[int, ...] = (16, 16, 16, 16)
    em_tail_range: int = 32
    cand_capacity_factor: int = 8   # candidate buffer = factor * parent cap

    # recurrent lossless-based EM (reference: model_config.py recurrent_part_*)
    recurrent_part_channels: int = 64
    lossless_coord_indexes_range: Tuple[int, ...] = (8, 8, 8, 8)
    lossless_fea_num_filters: Tuple[int, ...] = (1, 3, 3, 3, 3, 1)
    prior_indexes_range: Tuple[int, ...] = (16, 16, 16, 16)
    hybrid_hyper_decoder_fea: bool = False
    bottleneck_process: str = 'noise'
    rec_capacity_div: int = 4       # recurrent-part row capacity = cap / div
    rec_cand_factor: int = 4        # candidate buffer = factor * rec capacity
                                    # (all-8-children expansion; shells shrink
                                    # ~4x per scale, not 8x)
    coder_lanes: int = 256          # device word-coder lanes (lossless_based)
