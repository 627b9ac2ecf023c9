from .distributions import (
    DeepFactorized, noisy_logits_likelihood, noisy_normal_likelihood,
)
from .batched import ContinuousBatchedEntropyModel
from .indexed import ContinuousIndexedEntropyModel
from .utils import concat_byte_streams, split_byte_streams, grad_scale
