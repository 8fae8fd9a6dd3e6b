"""Step-granular diffusion learner — the standalone CDiffuSE trainer.

Re-design of the vendored cdiffuse/learner.py (DiffuSELearner): an
infinite step loop with max_steps, NaN-loss guard, checkpoint every
dataset pass with a ``weights`` alias, partial pretrain loading that
drops the conditioner weights, and scalar summaries every 50 steps —
rebuilt on the functional diffuse_step.
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path

import jax
import numpy as np

from speech_enhancement_tpu.train.diffusion import diffuse_step
from speech_enhancement_tpu.train.state import ModuleState
from speech_enhancement_tpu.utils import load_checkpoint, save_checkpoint


class DiffuSELearner:
    """cdiffuse/learner.py:41-177 equivalent."""

    def __init__(
        self,
        model_dir: str,
        model,
        state: ModuleState,
        tx,
        dataset,
        noise_schedule,
        criterion,
        *,
        n_fft: int = 400,
        hop: int = 100,
        max_grad_norm: float | None = None,
        summary_every: int = 50,
        logger=None,
    ):
        self.model_dir = Path(model_dir)
        self.model_dir.mkdir(parents=True, exist_ok=True)
        self.model = model
        self.state = state
        self.tx = tx
        self.dataset = dataset
        self.noise_schedule = noise_schedule
        self.criterion = criterion
        self.n_fft = n_fft
        self.hop = hop
        self.summary_every = summary_every
        self.logger = logger
        self.step = int(state.step)

    # -- checkpointing (learner.py:97-121) --------------------------------
    def save_to_checkpoint(self, filename: str = "weights") -> None:
        host = jax.device_get(self.state)
        save_checkpoint(host, str(self.model_dir), self.step, is_best=False)
        # 'weights' alias to the latest step (the reference's symlink)
        alias = self.model_dir / filename
        target = self.model_dir / f"checkpoint_{self.step:04d}"
        if alias.exists():
            shutil.rmtree(alias)
        shutil.copytree(target, alias)

    def restore_from_checkpoint(self, filename: str = "weights") -> bool:
        path = self.model_dir / filename
        if not path.exists():
            return False
        self.state = load_checkpoint(str(path), jax.device_get(self.state))
        self.step = int(self.state.step)
        return True

    # -- training loop (learner.py:123-168) -------------------------------
    def train(self, max_steps: int | None = None, rng_seed: int = 0):
        # Per-step rng is fold_in(base, step), not a split chain: a run
        # resumed from a checkpoint continues the exact noise/timestep
        # stream of the original run (a split chain would restart from
        # PRNGKey(seed) while the data stream advances).
        base_rng = jax.random.PRNGKey(rng_seed)
        # Advance the loader's epoch on every pass: DataLoader draws ALL
        # crop/shuffle randomness from (seed, epoch, shard, batch), so a
        # never-advancing epoch would feed byte-identical batches — the
        # same fixed crop of every utterance — for the whole run (the
        # reference reshuffles per pass via its sampler).  Derive the
        # starting pass AND in-pass offset from the restored step: a
        # checkpoint saved mid-pass (e.g. a max_steps stop) must resume at
        # the next unseen batch, not replay the pass from batch 0 — the
        # loader is deterministic on (seed, epoch, shard, batch), so the
        # skipped prefix is byte-identical to what the restored run saw.
        passes, skip = 0, 0
        n_batches = getattr(self.dataset, "__len__", lambda: 0)()
        if n_batches:
            passes, skip = divmod(self.step, n_batches)
        while True:
            if hasattr(self.dataset, "set_epoch"):
                self.dataset.set_epoch(passes)
            for bi, batch in enumerate(self.dataset):
                if bi < skip:
                    continue
                if max_steps is not None and self.step >= max_steps:
                    return self.state
                if batch.audio.shape[0] == 0:
                    continue
                step_rng = jax.random.fold_in(base_rng, self.step)
                t0 = time.time()
                self.state, loss, grad_norm = diffuse_step(
                    self.state, batch.audio, batch.noisy,
                    self.noise_schedule, step_rng,
                    model=self.model, criterion=self.criterion, tx=self.tx,
                    n_fft=self.n_fft, hop=self.hop, train=True,
                    return_grad_norm=True,
                )
                loss = float(loss)
                if not np.isfinite(loss):
                    raise RuntimeError(
                        f"Detected NaN loss at step {self.step}."
                    )
                if self.step % self.summary_every == 0:
                    self._write_summary(loss, time.time() - t0,
                                        float(grad_norm), batch)
                self.step += 1
            skip = 0
            self.save_to_checkpoint()
            passes += 1

    def _write_summary(self, loss: float, step_time: float,
                       grad_norm: float = 0.0, batch=None) -> None:
        """Summaries matching the reference's tensorboard set
        (cdiffuse/learner.py:170-177): train loss + grad norm as scalars,
        plus an audio sample and its conditioner spectrogram as artifacts
        under ``summaries/`` (wav + npy stand in for add_audio/add_image;
        no tensorboard writer is assumed on a TPU VM)."""
        rec = {"step": self.step, "loss": loss, "grad_norm": grad_norm,
               "step_time": step_time}
        with open(self.model_dir / "summary.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")
        if batch is not None and getattr(batch, "audio", None) is not None \
                and len(batch.audio):
            from speech_enhancement_tpu.data import save_wav

            sdir = self.model_dir / "summaries"
            sdir.mkdir(exist_ok=True)
            audio = np.asarray(batch.audio[0], np.float32)
            save_wav(sdir / f"step_{self.step:06d}_audio.wav", audio)
            spec = getattr(batch, "spectrogram", None)
            if spec is None:
                from speech_enhancement_tpu.data.preprocess import (
                    make_spectrum,
                )
                spec, _, _ = make_spectrum(
                    y=audio, frame_length=self.n_fft, shift=self.hop
                )
            else:
                spec = np.asarray(spec[0])
            np.save(sdir / f"step_{self.step:06d}_spectrogram.npy", spec)
        if self.logger:
            self.logger.info(
                f"step {self.step}: loss {loss:.5f} grad_norm {grad_norm:.3f}"
            )


def load_pretrain_params(state: ModuleState, pretrain_state: ModuleState):
    """Partial pretrain load dropping conditioner weights
    (learner.py:73-95): copies every leaf except conditioner projections
    and the input projection, which stay freshly initialized."""

    def merge(path, new, old):
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        if "conditioner_projection" in names or "input_projection" in names:
            return new
        return old if new.shape == old.shape else new

    params = jax.tree_util.tree_map_with_path(
        merge, state.params, pretrain_state.params
    )
    return state.replace(params=params)
