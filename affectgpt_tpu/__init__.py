"""AffectGPT-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
Open-Vocabulary Multimodal Emotion Recognition, capability-equivalent to
the PyTorch AffectGPT reference but designed for TPU hardware from the
ground up: fused device-side media preprocessing, static-shape multimodal
token splicing, a compiled prefill+decode path with KV cache, and
mesh-sharded (dp×tp) training via shard_map/pjit.
"""

__version__ = "0.1.0"
