from .rans import RansDecoder, RansEncoder, native_available, pmf_to_quantized_cdf

__all__ = ["RansEncoder", "RansDecoder", "pmf_to_quantized_cdf", "native_available"]
