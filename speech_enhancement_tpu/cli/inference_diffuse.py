"""Diffusion inference: reverse sampling + metric evaluation.

CLI mirror of the reference's ``inference_diffuse.py`` — the reverse
schedule (including --fast 6-step interpolation) is host numpy, the
per-step loop is the jitted lax.scan samplers in train.diffusion.
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

from speech_enhancement_tpu.cli.main_diffuse import build_model, init_state
from speech_enhancement_tpu.config import get_config
from speech_enhancement_tpu.data import load_wav, save_wav
from speech_enhancement_tpu.enhance import round_to_bucket, wrap_pad
from speech_enhancement_tpu.metrics import compute_metrics
from speech_enhancement_tpu.train import (
    inference_schedule,
    sample_tsc,
    sample_waveform,
)
from speech_enhancement_tpu.utils import load_variables, sweep_checkpoints

MODEL_NAMES = ["diffuse", "tsc-diffuse"]


def parse_option(argv=None):
    parser = argparse.ArgumentParser(description="diffusion inference")
    parser.add_argument("-a", "--arch", default="diffuse", choices=MODEL_NAMES)
    parser.add_argument("--output", "-o", type=str, required=True)
    parser.add_argument("--model_path", "-m", type=str, required=True)
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--save", action="store_true")
    parser.add_argument("--validate-epochs", action="store_true")
    parser.add_argument("--start", default=None, type=int)
    parser.add_argument("--end", default=None, type=int)
    parser.add_argument("--comp-type", default="pow",
                        choices=["norm", "log", "pow", "none"])
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--seed", default=0, type=int,
                        help="template-init seed (values are replaced by "
                             "the restored checkpoint; present because "
                             "init_state is shared with main_diffuse)")
    parser.add_argument(
        "--sampler-batch", default=8, type=int,
        help="utterances sampled per compiled reverse pass (length-"
             "bucketed like the GAN Enhancer; the samplers are bandwidth-"
             "bound so batching is near-free throughput, "
             "docs/DIFFUSION_BENCH.md).  1 = reference-faithful per-"
             "utterance sampling with exact hop-multiple padding "
             "(inference_diffuse.py:192-269)")
    parser.add_argument("--opts", default=None, nargs="+")
    args = parser.parse_args(argv)
    config = get_config(args)
    return args, config


def load_model(model_path, args, config):
    model = build_model(args, config)
    crop_len = config.CROP_FRAMES * config.HOP_SAMPLES * config.CROP_LEN
    template = init_state(args, config, model, optax.sgd(1e-3), crop_len)
    return model, load_variables(model_path, template.variables())


def _rms_gain(signal: np.ndarray) -> float:
    """Per-utterance RMS gain c = sqrt(T / sum(x^2)) with the silent-
    utterance guard (c = 1): the reference's unguarded expression is inf
    on an all-zero wav, and 0 * inf = NaN would poison the whole sampled
    chunk (same deviation as ops.normalize_batch)."""
    energy = float(np.sum(np.asarray(signal) ** 2.0))
    return float(np.sqrt(len(signal) / energy)) if energy > 0 else 1.0


def predict(model, variables, args, config, noisy_signal, schedule, rng):
    """Per-utterance sampling with reference padding/normalization
    semantics (inference_diffuse.py:192-269)."""
    hop = config.HOP_SAMPLES
    length = len(noisy_signal)
    if args.arch.startswith("diffuse"):
        # reference predict feeds the raw (unpadded) signal; the sampler
        # frames it to floor(L/hop) internally (inference_diffuse.py:198)
        x = jnp.asarray(noisy_signal[None, :], jnp.float32)
        audio = sample_waveform(model, variables, x, schedule, rng,
                                hop=hop, n_fft=config.N_FFT)
        return np.asarray(audio)[0][:length]
    # tsc: RMS normalize + wrap-pad like the GAN predict
    c = _rms_gain(noisy_signal)
    padded = ((length + hop - 1) // hop) * hop
    x = jnp.asarray(wrap_pad(noisy_signal * c, padded)[None], jnp.float32)
    audio = sample_tsc(model, variables, x, schedule, rng,
                       n_fft=config.N_FFT, hop=hop, comp_type=args.comp_type)
    return (np.asarray(audio)[0] / c)[:length]


def predict_batch(model, variables, args, config, signals, schedule, rng):
    """Batched sampling: same per-utterance math as :func:`predict`, but
    the whole chunk shares one compiled lax.scan reverse pass.  Signals
    are padded to a common bucket length; the extra context is the same
    accepted deviation as the GAN Enhancer's bucketing.  With
    ``--sampler-batch 1`` the bucket quantum degenerates to the hop, so a
    singleton chunk reproduces :func:`predict` bit-for-bit."""
    hop = config.HOP_SAMPLES
    lengths = [len(s) for s in signals]
    singleton = len(signals) == 1 and args.sampler_batch == 1
    # round_to_bucket asserts quantum % hop == 0; HOP_SAMPLES is config-
    # overridable, so derive the ~0.5 s quantum from the hop instead of
    # hard-coding 8000 (which only divides by the default hop=100)
    quantum = hop if singleton else max(hop, 8000 - 8000 % hop)
    bucket = round_to_bucket(max(lengths), quantum=quantum, hop=hop)
    if args.arch.startswith("diffuse"):
        if singleton:
            # exact predict() framing: the raw signal, unpadded (padding
            # to a hop multiple would change the frame count and thus
            # every noise draw inside the sampler)
            x = jnp.asarray(np.asarray(signals[0], np.float32)[None])
        else:
            # sample_waveform zero-fills past the utterance internally;
            # the batch just needs a common length
            x = jnp.asarray(np.stack([
                np.pad(np.asarray(s, np.float32), (0, bucket - len(s)))
                for s in signals
            ]))
        audio = np.asarray(sample_waveform(
            model, variables, x, schedule, rng,
            hop=hop, n_fft=config.N_FFT,
        ))
        return [audio[i][:n] for i, n in enumerate(lengths)]
    cs = [_rms_gain(s) for s in signals]
    x = jnp.asarray(np.stack([
        wrap_pad(np.asarray(s, np.float32) * c, bucket)
        for s, c in zip(signals, cs)
    ]))
    audio = np.asarray(sample_tsc(
        model, variables, x, schedule, rng,
        n_fft=config.N_FFT, hop=hop, comp_type=args.comp_type,
    ))
    return [(audio[i] / cs[i])[:n] for i, n in enumerate(lengths)]


def inference(args, config, model_path, data_paths):
    model, variables = load_model(model_path, args, config)
    schedule = inference_schedule(
        config.NOISE_SCHEDULE, config.INFERENCE_NOISE_SCHEDULE, fast=args.fast
    )
    rng = jax.random.PRNGKey(23)
    metrics_total = np.zeros(6)
    out_dir = Path(args.output) / Path(data_paths[0]).parent.name
    if args.save:
        out_dir.mkdir(parents=True, exist_ok=True)

    noisies, cleans = [], []
    for path in data_paths:
        # join on the basename, NOT str.replace on the dir: with a
        # relative or repeated dir string the substring replace rewrites
        # the wrong path component and loads a missing (or worse, wrong)
        # clean reference
        clean_path = os.path.join(config.DATA.TEST_CLEAN_DIR,
                                  os.path.basename(path))
        noisies.append(load_wav(path, config.SAMPLE_RATE)[0])
        cleans.append(load_wav(clean_path, config.SAMPLE_RATE)[0])

    # length-bucketed chunks (stable sort; NOTE the visit order — and so
    # the per-chunk rng assignment — is length-sorted, not file order:
    # per-utterance math is pinned by the predict() parity test, but
    # which random draws an utterance gets is not part of that contract)
    chunk_size = max(1, args.sampler_batch)
    order = sorted(range(len(noisies)), key=lambda i: len(noisies[i]))
    ests: list[np.ndarray | None] = [None] * len(noisies)
    for i in range(0, len(order), chunk_size):
        chunk = order[i:i + chunk_size]
        rng, sub = jax.random.split(rng)
        outs = predict_batch(model, variables, args, config,
                             [noisies[j] for j in chunk], schedule, sub)
        for j, est in zip(chunk, outs):
            ests[j] = est

    for path, clean, est in zip(data_paths, cleans, ests):
        metrics_total += np.array(
            compute_metrics(clean, est, config.SAMPLE_RATE, 0)
        )
        if args.save:
            save_wav(out_dir / Path(path).name, est, config.SAMPLE_RATE)
    return metrics_total


def _report(m):
    print(
        f"pesq: {m[0]:.3f}\t csig: {m[1]:.3f}\t cbak: {m[2]:.3f}\t "
        f"covl: {m[3]:.3f}\t ssnr: {m[4]:.3f}\t stoi: {m[5]:.3f}"
    )


def main(argv=None):
    args, config = parse_option(argv)
    data_paths = sorted(glob(f"{config.DATA.TEST_NOISY_DIR}/*.wav"))
    num = len(data_paths)
    if num == 0:
        raise SystemExit(f"no test wavs in {config.DATA.TEST_NOISY_DIR}")
    if args.validate_epochs:
        # same sweep semantics as inference_gan (shared helper):
        # preemption checkpoints are skipped, --start/--end optional,
        # empty sweeps fail loudly instead of reporting a bogus best
        epochs = sweep_checkpoints(args.model_path, args.start, args.end)
        if not epochs:
            raise SystemExit(
                f"no restorable checkpoint_*/variables under "
                f"{args.model_path} in the requested range"
            )
        best_pesq, best_epoch = 0.0, 0
        for epoch, ckpt in epochs:
            m = inference(args, config, str(ckpt), data_paths) / num
            print(f"Epoch: {epoch}")
            _report(m)
            if m[0] > best_pesq:
                best_pesq, best_epoch = m[0], epoch
        print(f"Best epoch: {best_epoch}\t best PESQ: {best_pesq}")
    else:
        m = inference(args, config, args.model_path, data_paths) / num
        _report(m)


if __name__ == "__main__":
    main()
