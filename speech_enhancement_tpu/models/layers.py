"""Shared building-block layers for all model families.

Channels-last (NHWC / NLC) throughout — the XLA:TPU-preferred layout — in
contrast to the reference's NCHW torch modules.  Parity targets cited per
class.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def kaiming_normal_init(dtype=jnp.float32):
    """Kaiming-normal (fan_in, ReLU gain) weight init matching
    ``torch.nn.init.kaiming_normal_`` as applied by the reference's
    ``kaiming_init`` (utils/utils.py:92-104).  Biases are handled with
    :func:`bias_init_001`."""

    def init(key, shape, dtype=dtype):
        # flax conv kernels: (*window, in_features, out) -> fan_in = prod(window)*in
        # dense kernels: (in, out) -> fan_in = in
        if len(shape) >= 2:
            fan_in = int(np.prod(shape[:-1]))
        else:
            fan_in = shape[0]
        std = np.sqrt(2.0 / fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def bias_init_001(key, shape, dtype=jnp.float32):
    """Bias fill 0.01 (utils/utils.py:96)."""
    return jnp.full(shape, 0.01, dtype)


class PReLU(nn.Module):
    """Per-channel PReLU over the last axis (torch ``nn.PReLU(num)``).

    ``num_parameters`` may be 1 (shared) or the size of the last axis.
    """

    num_parameters: int = 1
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha",
            lambda key, shape: jnp.full(shape, self.init, jnp.float32),
            (self.num_parameters,),
        )
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True) equivalent: per-sample, per-channel
    normalization over the spatial axes of a channels-last tensor
    (torch default eps=1e-5, no running stats)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # x: [B, *spatial, C] — normalize over spatial dims per (B, C).
        # Statistics always accumulate in float32 (bf16 means over 10^5
        # elements lose several digits), output returns in x.dtype.
        axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class LearnableSigmoid(nn.Module):
    """beta * sigmoid(slope * x) with learnable per-feature slope
    (reference: models/discriminator.py:7-15)."""

    in_features: int = 1
    beta: float = 1.0

    @nn.compact
    def __call__(self, x):
        slope = self.param("slope", nn.initializers.ones, (self.in_features,))
        return self.beta * jax.nn.sigmoid(slope.astype(x.dtype) * x)


def swish(x):
    return x * jax.nn.sigmoid(x)


class SpectralNormDense(nn.Module):
    """Dense layer under spectral normalization.

    Power iteration state (the left singular vector estimate ``u``) lives in
    the ``spectral`` variable collection and is updated only when
    ``update_stats=True`` — the functional equivalent of torch's
    ``nn.utils.spectral_norm`` forward-hook mutation
    (reference: models/discriminator.py:39-56).
    """

    features: int
    use_bias: bool = True
    kernel_init: Callable = kaiming_normal_init()
    n_iter: int = 1

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_f = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_f, self.features))
        sigma = _spectral_sigma(self, kernel, update_stats)
        w = (kernel / sigma).astype(x.dtype)
        y = x @ w
        if self.use_bias:
            bias = self.param("bias", bias_init_001, (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class SpectralNormConv(nn.Module):
    """2D conv (NHWC) under spectral normalization; torch reshapes the
    kernel to (out, in*kh*kw) for the power iteration — we use the
    transposed-equivalent (kh*kw*in, out) which has the same sigma."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence = ((1, 1), (1, 1))
    use_bias: bool = False
    kernel_init: Callable = kaiming_normal_init()

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        kh, kw = self.kernel_size
        in_f = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (kh, kw, in_f, self.features))
        sigma = _spectral_sigma(self, kernel.reshape(-1, self.features), update_stats)
        w = (kernel / sigma).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=tuple(self.strides),
            padding=tuple(self.padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", bias_init_001, (self.features,))
            y = y + bias.astype(x.dtype)
        return y


def _spectral_sigma(mdl: nn.Module, flat_kernel: jnp.ndarray, update_stats: bool):
    """Largest-singular-value estimate of a [rows, cols] kernel by one step
    of power iteration, matching torch's spectral_norm exactly: both
    singular-vector estimates (``u`` size cols, ``v`` size rows) persist in
    the ``spectral`` collection; at eval time sigma uses the stored pair
    with no recomputation; gradients flow through the kernel only.
    """
    rows, cols = flat_kernel.shape
    u_var = mdl.variable(
        "spectral",
        "u",
        lambda: jax.random.normal(jax.random.PRNGKey(0), (cols,), jnp.float32),
    )
    v_var = mdl.variable(
        "spectral",
        "v",
        lambda: jax.random.normal(jax.random.PRNGKey(1), (rows,), jnp.float32),
    )
    u = jax.lax.stop_gradient(u_var.value)
    if update_stats:
        k_const = jax.lax.stop_gradient(flat_kernel)
        v = k_const @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = k_const.T @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        if not mdl.is_initializing():
            u_var.value = u_new
            v_var.value = v
        sigma = jnp.dot(v, flat_kernel @ u_new)
    else:
        v = jax.lax.stop_gradient(v_var.value)
        sigma = jnp.dot(v, flat_kernel @ u)
    return sigma
