"""rollingdepth_tpu — a TPU-native rebuild of RollingDepth (video depth + relighting).

A from-scratch JAX/XLA/Pallas framework with the capabilities of
yizuo417/RollingDepth (diffusion-based temporally-consistent monocular video
depth estimation, plus the fork's IC-Light fg/bg video relighting stack),
re-designed for TPU:

- snippets are a batch axis, jit-compiled and shardable over an ICI mesh
- cross-frame self-attention over the ``n*hw`` snippet token axis runs in a
  fused Pallas flash-attention kernel (replaces xformers CUDA kernels)
- schedulers, the co-alignment solver and the refinement loop are pure
  functional ``lax``-compatible programs
- weights load from the reference's torch/safetensors checkpoints through a
  one-time converter (incl. the IC-Light additive-offset merge).

Reference behavior citations point into /root/reference (file:line).
"""

__version__ = "0.1.0"

from .utils.presets import PRESETS, InferenceSettings, resolve_preset  # noqa: F401
from .pipelines.snippets import (  # noqa: F401
    cap_max_dilation,
    snippet_indices,
    snippet_index_matrix,
)

__all__ = [
    "PRESETS",
    "InferenceSettings",
    "resolve_preset",
    "cap_max_dilation",
    "snippet_indices",
    "snippet_index_matrix",
]
