from .rans import (
    PRECISION, PROB_SCALE,
    batched_pmf_to_quantized_cdf,
    IndexedRansCoder, BinaryRansCoder,
    RansEncoder, RansDecoder,
)
