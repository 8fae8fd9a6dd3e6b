"""Functional train-state containers (pytrees)."""

from __future__ import annotations

from typing import Any

import flax.struct


@flax.struct.dataclass
class ModuleState:
    """Params + auxiliary variable collections + optimizer state for one
    model.  ``extra`` holds collections like ``batch_stats`` / ``spectral``."""

    params: Any
    extra: dict
    opt_state: Any
    step: int = 0

    def variables(self) -> dict:
        return {"params": self.params, **self.extra}


@flax.struct.dataclass
class GanTrainState:
    """Generator + discriminator pair (main_gan.py two-optimizer setup)."""

    gen: ModuleState
    disc: ModuleState
    best_loss: float = 1e8
    epoch: int = 0
