"""Standalone CDiffuSE trainer — the vendored mini-framework's entry point
(cdiffuse/__main__.py re-design).

Usage:
  python -m speech_enhancement_tpu.cli.cdiffuse <model_dir> <clean_dir> \
      <noisy_dir> [--max-steps N]

Step-granular training (DiffuSELearner) of the upstream DiffuSE variant
(no GroupNorm, cdiffuse/model.py) with Adam lr 2e-4
(cdiffuse/learner.py:182), batch split across all local devices by the
mesh rather than per-GPU process spawning.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_enhancement_tpu.data import Collator, DataLoader, VoicebankDataset
from speech_enhancement_tpu.models import DiffuSE
from speech_enhancement_tpu.train import ModuleState, build_criterion
from speech_enhancement_tpu.train.learner import DiffuSELearner
from speech_enhancement_tpu.utils import create_logger

# cdiffuse/params.py defaults
PARAMS = dict(
    batch_size=16,
    learning_rate=2e-4,
    sample_rate=16000,
    n_specs=201,  # SE mode conditioner bins for the integrated 400-fft path
    n_fft=400,
    hop_samples=100,
    crop_mel_frames=160,
    residual_layers=30,
    residual_channels=64,
    dilation_cycle_length=10,
)


def parse_option(argv=None):
    parser = argparse.ArgumentParser(description="train (or resume) CDiffuSE")
    parser.add_argument("model_dir")
    parser.add_argument("clean_dir")
    parser.add_argument("noisy_dir")
    parser.add_argument("--max-steps", default=None, type=int)
    parser.add_argument("--batch-size", default=PARAMS["batch_size"], type=int)
    parser.add_argument("--lr", default=PARAMS["learning_rate"], type=float)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("-j", "--workers", default=4, type=int)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_option(argv)
    logger = create_logger(args.model_dir, name="cdiffuse")
    noise_schedule = jnp.asarray(np.linspace(1e-4, 0.035, 50), jnp.float32)

    model = DiffuSE(
        dilation_cycle_length=PARAMS["dilation_cycle_length"],
        hop_length=PARAMS["hop_samples"],
        n_specs=PARAMS["n_specs"],
        num_steps=50,
        residual_channels=PARAMS["residual_channels"],
        residual_layers=PARAMS["residual_layers"],
        use_groupnorm=False,  # upstream variant (cdiffuse/model.py)
    )
    crop_len = PARAMS["crop_mel_frames"] * PARAMS["hop_samples"]
    audio = jnp.zeros((1, crop_len))
    cond = jnp.zeros((1, crop_len // PARAMS["hop_samples"], PARAMS["n_specs"]))
    # jitted init: un-jitted flax init dispatches op-by-op (minutes over
    # this host's TPU tunnel)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(args.seed)}, audio, cond, jnp.array([0])
    )
    tx = optax.adam(args.lr)
    state = ModuleState(
        params=variables["params"],
        extra={k: v for k, v in variables.items() if k != "params"},
        opt_state=tx.init(variables["params"]),
    )

    dataset = VoicebankDataset(
        args.clean_dir, args.noisy_dir, PARAMS["hop_samples"],
        PARAMS["crop_mel_frames"],
    )
    loader = DataLoader(
        dataset, args.batch_size,
        Collator(PARAMS["hop_samples"], PARAMS["crop_mel_frames"],
                 rng=np.random.default_rng(args.seed), silence_check=False),
        shuffle=True, seed=args.seed, num_workers=args.workers,
    )

    learner = DiffuSELearner(
        args.model_dir, model, state, tx, loader, noise_schedule,
        build_criterion("l1"), n_fft=PARAMS["n_fft"],
        hop=PARAMS["hop_samples"], logger=logger,
    )
    learner.restore_from_checkpoint()
    learner.train(max_steps=args.max_steps, rng_seed=args.seed)
    learner.save_to_checkpoint()


if __name__ == "__main__":
    main()
