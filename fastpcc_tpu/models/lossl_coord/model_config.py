"""Config for the lossless-coordinate flagship model
(reference: models/convolutional/lossl_coord/model_config.py:7-19)."""
from dataclasses import dataclass

from fastpcc_tpu.config import SimpleConfig


@dataclass
class Config(SimpleConfig):
    channels: int = 256
    max_stride_wo_recurrent: int = 2048
    max_stride: int = 8192
    fea_stride: int = 16
    use_more_ch_for_multi_step_pred: bool = False
    feature_propagation: bool = True  # False = wo_fea_prop ablation
                                      # (reference: lossl_coord_wo_fea_prop)
    coord_bits: int = 18            # bits per axis for Morton packing (batch in high bits)
    bucket_growth: float = 1.5      # padded-shape bucketing factor (recompile control)

    skip_top_scales_num: int = 0    # test phase rate laddering
    compute_dtype: str = 'bfloat16'
    train_remat: bool = True        # jax.checkpoint each scale block in
                                    # train_loss (ch128 at 64k rows needs
                                    # ~91GB HBM without it; ~FLOP-cheap:
                                    # one extra forward per scale)
    device_coder: bool = True       # lane-interleaved rANS on device (TPU);
                                    # False = reference-style host coder
    coder_lanes: int = 1024

    cal_avs_pc_evalue: bool = False
    quantize_param: bool = False
    int_param_save_path: str = 'int_param.pt'
