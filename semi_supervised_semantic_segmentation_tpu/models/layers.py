"""Shared model building blocks (flax.linen, NHWC, bf16 compute / f32 params).

Conventions (TPU-first):
  - NHWC layout everywhere; convs lower to XLA:TPU MXU convolutions.
  - ``dtype`` is the compute dtype (bf16 by default), ``param_dtype`` stays
    float32; flax BatchNorm computes statistics in f32 internally.
  - BatchNorm under data parallelism: with GSPMD jit the batch axis is
    sharded on the mesh, so the mean/variance reductions XLA emits are
    *global* — SyncBN semantics with zero extra code (SURVEY.md N3).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class Norm(nn.Module):
    """Switchable normalization: BatchNorm (reference default) or GroupNorm."""

    kind: str = "batchnorm"
    momentum: float = 0.9
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "batchnorm":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.momentum,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        if self.kind == "groupnorm":
            groups = min(32, x.shape[-1])
            return nn.GroupNorm(
                num_groups=groups, dtype=self.dtype, param_dtype=jnp.float32
            )(x)
        raise ValueError(f"unknown norm kind: {self.kind}")


class ConvNormAct(nn.Module):
    """Conv -> Norm -> (optional) ReLU, the workhorse block."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    act: bool = True
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (
            (self.kernel[0] - 1) * self.dilation[0] // 2,
            (self.kernel[1] - 1) * self.dilation[1] // 2,
        )
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=((pad[0], pad[0]), (pad[1], pad[1])),
            kernel_dilation=self.dilation,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = Norm(self.norm, self.bn_momentum, self.dtype)(x, train)
        if self.act:
            x = nn.relu(x)
        return x


def max_pool_same_as_torch(x, window: int = 3, stride: int = 2, pad: int = 1):
    """torch MaxPool2d(kernel=3, stride=2, padding=1) with -inf padding."""
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
    )
