"""psalm_tpu: a TPU-native (JAX/XLA/Pallas/pjit) multimodal segmentation framework.

Built from scratch with the capabilities of PSALM (zamling/PSALM): a Phi-1.5 LLM
with a Swin-B vision tower and a Mask2Former-style mask head unifying
panoptic/instance/semantic segmentation, referring segmentation, interactive
(visual-prompt) segmentation, open-vocabulary semantic segmentation,
conversation, and video object segmentation.

The design is TPU-first rather than a port: static-shape token splicing decided
in the host data pipeline, an XLA/Pallas multi-scale deformable attention op,
and pjit data parallelism with sharded optimizer state over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"

from psalm_tpu.config import (  # noqa: F401
    PSALMConfig,
    PhiConfig,
    SwinConfig,
    ProjectorConfig,
    PixelDecoderConfig,
    MaskDecoderConfig,
    LossConfig,
    SegTask,
)
