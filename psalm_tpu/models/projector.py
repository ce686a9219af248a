"""Vision->LLM projector.

PSALM's default is ``swin_conv`` = ResNetSwin (multimodal_projector/
builder.py:326-375,421-424): a single stride-2 BasicBlock (1024->2048 with
BatchNorm) followed by flatten and a Linear 2048->hidden_size, mapping the
res5 map (stride 32, 32x32 for a 1024 image) to 1024 image tokens of LLM dim.

Parity quirk: the reference BasicBlock.forward applies ``conv2`` TWICE
(builder.py:92-94 — `out = self.conv2(out)` then the `if not self.with_dcn`
branch applies it again). We reproduce that exactly so released-checkpoint
weights produce identical activations.

BatchNorm runs in inference mode with stored running stats (the projector is
trained jointly but eval-parity requires the frozen-stat behavior of
torch .eval()); we expose `use_running_average` for training.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from psalm_tpu.config import ProjectorConfig


class ResNetSwinProjector(nn.Module):
    cfg: ProjectorConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, res5: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """res5: [B, H, W, C_in] -> tokens [B, (H/2)*(W/2), out_dim]."""
        c = self.cfg
        planes = 2 * c.input_dim  # 2048 for Swin-B

        def conv3x3(x, features, stride, name):
            return nn.Conv(features, (3, 3), strides=(stride, stride),
                           padding=((1, 1), (1, 1)), use_bias=False,
                           dtype=self.dtype, name=name)(x)

        def bn(x, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.float32, name=name)(x)

        x = res5
        out = conv3x3(x, planes, 2, "conv1")
        out = bn(out, "bn1")
        out = nn.relu(out)
        # conv2 applied twice with shared weights — reference parity
        # (builder.py:92-94).
        conv2 = nn.Conv(planes, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype, name="conv2")
        out = conv2(out)
        out = conv2(out)
        out = bn(out, "bn2")

        residual = nn.Conv(planes, (1, 1), strides=(2, 2), use_bias=False,
                           dtype=self.dtype, name="downsample_conv")(x)
        residual = bn(residual, "downsample_bn")
        out = nn.relu(out + residual)

        B, H, W, C = out.shape
        out = out.reshape(B, H * W, C)
        return nn.Dense(c.out_dim, dtype=self.dtype, name="fc")(out)
