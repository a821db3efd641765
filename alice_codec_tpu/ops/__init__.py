"""TPU compute ops: color, wavelet, quantization, entropy coding kernels."""

from . import color, quant, wavelet  # noqa: F401
