from .pc_error import compute_d1_d2_psnr, mpeg_pc_error
from .bjontegaard import bd_rate, bd_psnr
from .evaluator import PCCEvaluator
