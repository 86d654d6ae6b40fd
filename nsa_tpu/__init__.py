"""nsa_tpu: a TPU-native Native Sparse Attention (NSA) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Monstertail/CS441-Trainable-Sparse-Attention-for-LLM-Inference-Acceleration``:
three-branch trainable sparse attention (compressed + selected + sliding),
byte-level GPT pretraining, a structured sparse KV cache with a fully
jitted decode path, an evaluation suite, and mesh-parallel execution.
"""

from . import _cache_setup  # noqa: F401  (sets JAX compilation-cache env)
from .config import (
    DataConfig,
    MeshConfig,
    ModelConfig,
    NSAConfig,
    TrainConfig,
    reference_model_config,
    tiny_test_config,
)

__version__ = "0.1.0"

__all__ = [
    "DataConfig",
    "MeshConfig",
    "ModelConfig",
    "NSAConfig",
    "TrainConfig",
    "reference_model_config",
    "tiny_test_config",
]
