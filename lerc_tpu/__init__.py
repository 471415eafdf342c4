"""lerc_tpu: a TPU-native LERC (Limited Error Raster Compression) engine.

Built from scratch in JAX/XLA/Pallas with full wire compatibility with the
reference Esri/lerc C++ library (codec Lerc1 and Lerc2 v1-v6).
"""

__version__ = "0.1.0"
