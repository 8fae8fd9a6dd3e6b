"""Loss criteria (core/criterion.py): L1 (mae) or MSE.

Note the reference's GAN entry point hardcodes MSE regardless of the
--criterion flag (main_gan.py:190); our CLI reproduces that default.
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def get_accuracy(pred, label):
    """Classification accuracy helper (function.py:19-23 parity; unused by
    the enhancement paths, kept for API completeness)."""
    import jax.numpy as jnp

    return jnp.mean((jnp.argmax(pred, axis=1) == label).astype(jnp.float32))


def build_criterion(name: str):
    name = name.lower()
    if name in ("mae", "l1"):
        return l1_loss
    if name in ("mse", "l2"):
        return l2_loss
    raise ValueError(f"invalid criterion {name!r}")
