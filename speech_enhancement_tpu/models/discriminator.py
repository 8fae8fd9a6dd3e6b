"""Metric discriminator — predicts normalized PESQ of a (clean, other)
magnitude-spectrogram pair (reference: models/discriminator.py:35-62).

Channels-last: input is two ``[B, T, F]`` magnitude spectrograms, stacked
to ``[B, T, F, 2]``.  Four spectral-norm strided convs -> global max-pool
-> spectral-norm MLP -> learnable sigmoid.

Spectral-norm power-iteration state lives in the ``spectral`` variable
collection; pass ``update_stats=True`` (with ``mutable=['spectral']``)
during training steps.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from speech_enhancement_tpu.models.layers import (
    InstanceNorm,
    LearnableSigmoid,
    PReLU,
    SpectralNormConv,
    SpectralNormDense,
)


class Discriminator(nn.Module):
    ndf: int = 16
    dropout: float = 0.3

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        y: jnp.ndarray,
        deterministic: bool = True,
        update_stats: bool = False,
    ) -> jnp.ndarray:
        h = jnp.stack([x, y], axis=-1)  # [B, T, F, 2]
        widths = [self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8]
        for i, w in enumerate(widths):
            h = SpectralNormConv(
                w, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                use_bias=False, name=f"conv{i + 1}",
            )(h, update_stats=update_stats)
            h = InstanceNorm(name=f"norm{i + 1}")(h)
            h = PReLU(w, name=f"prelu{i + 1}")(h)
        h = jnp.max(h, axis=(1, 2))  # AdaptiveMaxPool2d(1) + flatten
        h = SpectralNormDense(self.ndf * 4, name="fc1")(h, update_stats=update_stats)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = PReLU(self.ndf * 4, name="prelu_fc")(h)
        h = SpectralNormDense(1, name="fc2")(h, update_stats=update_stats)
        return LearnableSigmoid(1, name="sigmoid")(h)
