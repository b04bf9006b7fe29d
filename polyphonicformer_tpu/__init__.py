"""PolyphonicFormer-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
depth-aware video panoptic segmentation, re-designed from the ground up with
the capability surface of HarborYuan/PolyphonicFormer."""

__version__ = "0.1.0"
