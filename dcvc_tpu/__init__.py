"""dcvc-tpu: a TPU-native neural video / image compression framework.

JAX / XLA / Pallas compute path, C++ entropy-coding runtime. Provides the
capabilities of the DCVC family of codecs (DCVC, DCVC-TCM, DCVC-HEM,
DCVC-DC, EVC) re-designed TPU-first.
"""

__version__ = "0.1.0"
