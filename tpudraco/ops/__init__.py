from .device import (
    bincount_kernel,
    dequantize_kernel,
    encode_step,
    parallelogram_predict_kernel,
    quantize_kernel,
    unzigzag_kernel,
    wrapped_difference_kernel,
    zigzag_kernel,
)
from .gathers import build_parallelogram_gathers

__all__ = [
    "bincount_kernel", "dequantize_kernel", "encode_step",
    "parallelogram_predict_kernel", "quantize_kernel", "unzigzag_kernel",
    "wrapped_difference_kernel", "zigzag_kernel",
    "build_parallelogram_gathers",
]
