"""ait_tpu — a TPU-native one-shot object detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of AIT (Adaptive Image
Transformer, CVPR 2021): Siamese backbone -> co-attention -> RPN -> ROI Align
-> per-proposal encoder-decoder transformer -> selective-kernel attention ->
match/no-match head, trained with CE + margin-ranking + smooth-L1 losses.

Design stance (vs. the reference CUDA/PyTorch implementation):
  * everything is fixed-shape and batched — the reference's per-image Python
    loops (proposal NMS, anchor subsampling, ROI sampling) are masked,
    vectorized device programs;
  * one `jit` spans the whole train/eval step; no host<->device ping-pong;
  * parallelism is a `jax.sharding.Mesh` + sharding annotations, not
    DataParallel replicate/scatter/gather;
  * hot inner modules (the AIT pair-transformer) have fused Pallas kernels.
"""

__version__ = "0.1.0"

from ait_tpu.config import Config  # noqa: E402

__all__ = ["Config", "__version__"]
