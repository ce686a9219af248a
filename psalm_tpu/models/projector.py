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


class LinearProjector(nn.Module):
    """projector_type='linear' (multimodal_projector/builder.py:407-408):
    one Linear from the flattened vision features to LLM dim."""

    cfg: ProjectorConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = feats.shape[0]
        x = feats.reshape(B, -1, feats.shape[-1])
        return nn.Dense(self.cfg.out_dim, dtype=self.dtype, name="fc")(x)


class MLPProjector(nn.Module):
    """projector_type='mlpNx_gelu' (builder.py:426-433): Linear + (N-1) x
    [GELU, Linear]."""

    cfg: ProjectorConfig
    depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = feats.shape[0]
        x = feats.reshape(B, -1, feats.shape[-1])
        x = nn.Dense(self.cfg.out_dim, dtype=self.dtype, name="fc_0")(x)
        for i in range(1, self.depth):
            x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.cfg.out_dim, dtype=self.dtype,
                         name=f"fc_{i}")(x)
        return x


def build_projector(cfg: ProjectorConfig, dtype: Any = jnp.float32,
                    name: str = "mm_projector"):
    """Projector factory mirroring build_vision_projector
    (builder.py:405-433): swin_conv (PSALM default) | linear | mlpNx_gelu."""
    import re
    t = cfg.projector_type
    if t == "swin_conv":
        return ResNetSwinProjector(cfg, dtype=dtype, name=name)
    if t == "linear":
        return LinearProjector(cfg, dtype=dtype, name=name)
    m = re.match(r"^mlp(\d+)x_gelu$", t)
    if m:
        return MLPProjector(cfg, depth=int(m.group(1)), dtype=dtype, name=name)
    raise ValueError(f"unknown projector_type {t!r}")
