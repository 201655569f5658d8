"""Amphion-TPU: a TPU-native (JAX/XLA/Pallas/pjit) audio generation framework.

A ground-up re-design of the capabilities of open-mmlab/Amphion (TTS, VC, SVC,
TTA, neural codecs, neural vocoders, DSP front end, evaluation metrics) for TPU
hardware: functional Flax models, jit-compiled train/sampling loops, Pallas
kernels for the hot DSP ops, and `jax.sharding.Mesh`-based parallelism.
"""

__version__ = "0.1.0"
