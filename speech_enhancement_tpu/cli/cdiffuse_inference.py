"""Standalone CDiffuSE inference (cdiffuse/inference.py re-design).

Reverse sampling starting FROM the noisy waveform with the final-step
noisy blend gamma=0.2 and per-step clamp (cdiffuse/inference.py:136-163),
with a model cache keyed by checkpoint path (:35-53).

Usage:
  python -m speech_enhancement_tpu.cli.cdiffuse_inference \
      --model-dir <dir> --noisy <wav-or-dir> -o out [--fast]
"""

from __future__ import annotations

import argparse
import os
from glob import glob
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_enhancement_tpu.data import load_wav, save_wav
from speech_enhancement_tpu.models import DiffuSE
from speech_enhancement_tpu.train import (
    ModuleState,
    inference_schedule,
    sample_waveform,
)
from speech_enhancement_tpu.utils import load_checkpoint

PARAMS = dict(
    n_specs=201,
    n_fft=400,
    hop_samples=100,
    residual_layers=30,
    residual_channels=64,
    dilation_cycle_length=10,
)

_model_cache: dict[str, tuple] = {}


def load_model(model_dir: str, params=None):
    """Checkpoint-keyed model cache (cdiffuse/inference.py:35-53)."""
    p = dict(PARAMS, **(params or {}))
    key = os.path.abspath(model_dir)
    if key in _model_cache:
        return _model_cache[key]
    if (Path(model_dir) / "variables").exists():
        # converted reference weights.pt (cli.convert_checkpoint writes
        # the model variables alone — no learner/optimizer state).  The
        # model config is inferred FROM the weights rather than PARAMS:
        # upstream checkpoints carry the vendored 16x upsampler
        # (cdiffuse/model.py:74-77, hop 256) while this framework's
        # trainer uses the hop-consistent 10x10 one — both serve, each
        # with its own self-consistent framing (model.hop_length)
        import orbax.checkpoint as ocp

        from speech_enhancement_tpu.cli.convert_checkpoint import (
            _infer_diffuse_model,
        )

        raw = ocp.StandardCheckpointer().restore(
            (Path(model_dir) / "variables").resolve()
        )
        out = (_infer_diffuse_model(raw), raw)
        _model_cache[key] = out
        return out
    model = DiffuSE(
        dilation_cycle_length=p["dilation_cycle_length"],
        hop_length=p["hop_samples"],
        n_specs=p["n_specs"],
        num_steps=50,
        residual_channels=p["residual_channels"],
        residual_layers=p["residual_layers"],
        use_groupnorm=False,
    )
    crop_len = 160 * p["hop_samples"]
    audio = jnp.zeros((1, crop_len))
    cond = jnp.zeros((1, 160, p["n_specs"]))
    # jitted init (template only — weights come from the checkpoint)
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, audio,
                                    cond, jnp.array([0]))
    tx = optax.adam(2e-4)
    template = ModuleState(
        params=variables["params"],
        extra={k: v for k, v in variables.items() if k != "params"},
        opt_state=tx.init(variables["params"]),
    )
    path = Path(model_dir)
    if (path / "weights").exists():
        path = path / "weights"
    state = load_checkpoint(str(path), template)
    out = (model, {"params": state.params, **state.extra})
    _model_cache[key] = out
    return out


def predict(noisy_signal: np.ndarray, model_dir: str, fast: bool = False,
            seed: int = 23) -> np.ndarray:
    model, variables = load_model(model_dir)
    schedule = inference_schedule(
        np.linspace(1e-4, 0.035, 50),
        [0.0001, 0.001, 0.01, 0.05, 0.2, 0.35],
        fast=fast,
    )
    x = jnp.asarray(noisy_signal[None, :], jnp.float32)
    # frame with the MODEL's hop so the upsampled conditioner lines up
    # with the audio (a converted upstream checkpoint has hop 256; the
    # learner-trained model equals PARAMS['hop_samples'])
    audio = sample_waveform(model, variables, x, schedule,
                            jax.random.PRNGKey(seed),
                            hop=model.hop_length, n_fft=PARAMS["n_fft"],
                            clamp_every_step=True)
    return np.asarray(audio)[0][: len(noisy_signal)]


def main(argv=None):
    parser = argparse.ArgumentParser(description="CDiffuSE inference")
    parser.add_argument("--model-dir", required=True)
    parser.add_argument("--noisy", required=True,
                        help="noisy wav file or directory")
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--fast", action="store_true")
    args = parser.parse_args(argv)

    paths = (sorted(glob(f"{args.noisy}/*.wav"))
             if os.path.isdir(args.noisy) else [args.noisy])
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    for p in paths:
        noisy, sr = load_wav(p, 16000)
        est = predict(noisy, args.model_dir, fast=args.fast)
        save_wav(out_dir / Path(p).name, est, sr)
        print(f"enhanced {p} -> {out_dir / Path(p).name}")


if __name__ == "__main__":
    main()
