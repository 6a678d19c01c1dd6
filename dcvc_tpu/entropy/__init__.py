from .bit_estimator import BitEstimator, build_factorized_tables
from .coder import EntropyCoder
from .gaussian import GaussianConditionalCoder, build_gaussian_tables
from . import bits

__all__ = [
    "BitEstimator",
    "EntropyCoder",
    "GaussianConditionalCoder",
    "build_factorized_tables",
    "build_gaussian_tables",
    "bits",
]
