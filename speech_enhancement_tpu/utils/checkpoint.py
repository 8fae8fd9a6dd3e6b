"""Checkpoint / resume (orbax).

Replaces torch.save dict checkpoints (main_gan.py:300-310,
utils/utils.py:68-75): saves the full train-state pytree per epoch under
``checkpoint_EEEE`` plus a ``model_best`` copy on improvement, and restores
params + optimizer states + counters for --resume.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(
    state: Any,
    path: str,
    epoch: int,
    is_best: bool = False,
    keep_name: str = "model_best",
    variables: Any = None,
) -> str:
    """Save ``state`` (any pytree) to <path>/checkpoint_<epoch>; copy to
    <path>/model_best when is_best (utils.py:68-75 semantics).

    ``variables``, if given, is an inference-ready subtree (e.g. the
    generator's {params, batch_stats}) saved under ``.../variables`` so
    eval tooling can restore without reconstructing optimizer state
    (the analogue of inference_gan.py:64-69 reading gen_state_dict).
    """
    path = Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    target = path / f"checkpoint_{epoch:04d}"
    if target.exists():
        shutil.rmtree(target)
    ckptr = _checkpointer()
    ckptr.save(target / "state", state)
    ckptr.wait_until_finished()
    if variables is not None:
        ckptr.save(target / "variables", variables)
        ckptr.wait_until_finished()
    if is_best:
        best = path / keep_name
        if best.exists():
            shutil.rmtree(best)
        shutil.copytree(target, best)
    return str(target)


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore the full train-state pytree saved by
    :func:`save_checkpoint`.  ``template`` provides the structure/dtypes
    (the freshly-initialized state)."""
    p = Path(path).resolve()
    if (p / "state").exists():
        p = p / "state"
    ckptr = _checkpointer()
    return ckptr.restore(p, template)


def load_variables(path: str, template: Any) -> Any:
    """Restore the inference-ready variables subtree of a checkpoint."""
    ckptr = _checkpointer()
    return ckptr.restore(Path(path).resolve() / "variables", template)


def sweep_checkpoints(
    path: str, start: int | None = None, end: int | None = None
) -> list[tuple[int, Path]]:
    """Restorable ``(epoch, checkpoint_dir)`` pairs for an inference
    epoch sweep (``--validate-epochs``), shared by the gan and diffuse
    CLIs (reference inference_gan.py:154-160 sweeps a bare range).

    Checkpoints without an inference ``variables`` subtree — emergency
    preemption saves hold the train state only — are skipped with a
    message instead of crashing the sweep.  An explicit ``[start, end)``
    range probes the zero-padded names this framework writes; without a
    range the checkpoints actually present are discovered, keeping each
    glob path as-is so a foreign unpadded name (``checkpoint_5``) still
    restores from its real directory.
    """
    root = Path(path)

    def restorable(epoch: int, p: Path) -> bool:
        if (p / "variables").exists():
            return True
        print(f"skipping epoch {epoch}: no restorable variables "
              f"subtree under {p}")
        return False

    if start is not None and end is not None:
        pairs = [(e, root / f"checkpoint_{e:04d}") for e in range(start, end)]
    else:
        found = sorted(
            ((int(p.name.split("_", 1)[1]), p)
             for p in root.glob("checkpoint_*")
             if p.name.split("_", 1)[1].isdigit()),
            key=lambda ep: (ep[0], ep[1].name),
        )
        # one entry per epoch: a dir holding both the padded name this
        # framework writes (checkpoint_0005) and a foreign unpadded twin
        # (checkpoint_5) would otherwise evaluate the epoch twice, and
        # the later duplicate's score would silently win best-epoch.
        # Prefer a RESTORABLE twin — a padded preemption-only dir (train
        # state, no variables subtree) must not shadow a restorable
        # unpadded twin of the same epoch, which the old
        # dedup-before-filter order silently dropped from the sweep.
        in_range = [(e, p) for e, p in found
                    if (start is None or e >= start)
                    and (end is None or e < end)]
        seen: set[int] = set()
        pairs = []
        for e, _ in in_range:
            if e in seen:
                continue
            seen.add(e)
            twins = [q for ee, q in in_range if ee == e]
            keep = next((q for q in twins if (q / "variables").exists()),
                        twins[0])
            pairs.append((e, keep))
    return [(e, p) for e, p in pairs if restorable(e, p)]


def latest_checkpoint(path: str) -> str | None:
    p = Path(path)
    if not p.exists():
        return None
    # sort NUMERICALLY: step-named checkpoints (learner saves by step,
    # :04d) exceed 9999 in long runs, and lexicographic order would then
    # put checkpoint_10500 before checkpoint_9500 — `--resume auto`
    # would silently resume thousands of steps back
    cands = sorted(
        (d for d in os.listdir(p)
         if d.startswith("checkpoint_")
         and d.split("_", 1)[1].isdigit()),
        key=lambda d: int(d.split("_", 1)[1]),
    )
    return str(p / cands[-1]) if cands else None
