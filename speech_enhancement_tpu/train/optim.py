"""Optimizers and LR schedule (optax).

Re-designs core/optimizer.py + utils/utils.py:78-90: the same four
optimizer choices (sgd/adamw/lars/lamb), the same no-decay rule (1-D
params and biases are excluded — optimizer.py:55-61), and the hand-rolled
cyclic half-cosine schedule with per-cycle halving, expressed as an optax
schedule over the step counter.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def cyclic_cosine_schedule(
    base_lr: float,
    epochs: int,
    iters_per_epoch: int,
    cycle_limit: int = 4,
    warmup_epochs: int = 4,
    scale: float = 1.0,
) -> Callable[[Any], Any]:
    """Warmup + half-cycle cosine with per-cycle halving (utils.py:78-90).

    cycle_length = epochs // cycle_limit; within cycle q at offset r:
      warmup:  lr = 0.5^q * LR * r / warmup
      cosine:  lr = LR * 0.5^(q+1) * (1 + cos(pi*(r-warmup)/(cycle-warmup)))

    The reference *logs* lr + MIN_LR but applies lr without it
    (utils.py:87-90); we apply the same actual lr.  ``scale`` implements
    the discriminator's 2x lr (main_gan.py:192).
    """
    # guards the reference's div-by-zero for epochs < cycle_limit
    # (utils.py:80 divides by epochs//cycle_limit unguarded) and for
    # warmup >= cycle_length
    cycle_length = max(epochs // cycle_limit, 1)
    warmup_epochs = min(warmup_epochs, cycle_length - 1) if cycle_length > 1 else 0

    def schedule(step):
        epoch = step / float(iters_per_epoch)
        q = jnp.floor(epoch / cycle_length)
        r = epoch - q * cycle_length
        warm = (
            0.5**q * base_lr * r / warmup_epochs if warmup_epochs > 0 else 0.0
        )
        denom = max(cycle_length - warmup_epochs, 1e-9)
        cos = (
            base_lr
            * 0.5 ** (q + 1)
            * (1.0 + jnp.cos(math.pi * (r - warmup_epochs) / denom))
        )
        return scale * jnp.where(r < warmup_epochs, warm, cos)

    return schedule


def no_decay_mask(params) -> Any:
    """True where weight decay applies: excludes 1-D params and anything
    named ``bias`` (optimizer.py:48-62)."""

    def mask_fn(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        is_bias = any(str(n).endswith("bias") for n in names)
        return leaf.ndim > 1 and not is_bias

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def build_optimizer(
    name: str,
    learning_rate,
    params,
    momentum: float = 0.9,
    weight_decay: float = 0.01,
    max_norm: float = 0.0,
) -> optax.GradientTransformation:
    """sgd(nesterov) / adamw / lars / lamb with decay masking and optional
    global-norm clipping (optimizer.py:15-45, main_gan args)."""
    mask = no_decay_mask(params)
    name = name.lower()
    if name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask),
            optax.sgd(learning_rate, momentum=momentum, nesterov=True),
        )
    elif name == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=weight_decay, mask=mask)
    elif name == "lars":
        tx = optax.lars(
            learning_rate,
            weight_decay=weight_decay,
            weight_decay_mask=mask,
            trust_ratio_mask=mask,
            momentum=momentum,
        )
    elif name == "lamb":
        # the reference Lamb clips the global grad norm INSIDE the
        # optimizer before the moment updates (core/optimizer.py:156-173,
        # documented default max_grad_norm=1.0).  Reproduce that built-in
        # pre-clip here: max_norm if given, else the Lamb default 1.0.
        # (Passing --max-norm 0.0 to the reference actually divides by
        # zero inside its Lamb and silently zeroes every update — we use
        # the documented 1.0 default instead of reproducing the bug.)
        tx = optax.chain(
            optax.clip_by_global_norm(max_norm if max_norm else 1.0),
            optax.lamb(learning_rate, weight_decay=weight_decay, mask=mask),
        )
        return tx
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if max_norm and max_norm > 0.0:
        tx = optax.chain(optax.clip_by_global_norm(max_norm), tx)
    return tx


def adam(learning_rate) -> optax.GradientTransformation:
    """Plain Adam for the standalone cdiffuse learner (cdiffuse/learner.py:182)."""
    return optax.adam(learning_rate)
