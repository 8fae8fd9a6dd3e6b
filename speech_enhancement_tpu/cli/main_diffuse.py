"""Diffusion training entry point (archs 'diffuse' and 'tsc-diffuse').

CLI mirror of the reference's ``main_diffuse.py`` on the functional core.
Unlike the reference (which hard-requires DDP, main_diffuse.py:218-221),
single- and multi-device runs are the same code path here.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_enhancement_tpu.config import get_config
from speech_enhancement_tpu.data import Collator, DataLoader, VoicebankDataset
from speech_enhancement_tpu.models import DiffuSE, DiffusionTSCNet
from speech_enhancement_tpu.ops import compressed_stft
from speech_enhancement_tpu.parallel import (
    barrier,
    data_parallel_mesh,
    init_distributed,
    replicate_state,
    shard_batch,
)
from speech_enhancement_tpu.train import (
    ModuleState,
    build_criterion,
    build_optimizer,
    cyclic_cosine_schedule,
    diffuse_step,
    tsc_diffusion_step,
)
from speech_enhancement_tpu.utils import (
    AverageMeter,
    PreemptionGuard,
    create_logger,
    latest_checkpoint,
    load_checkpoint,
    load_variables,
    save_checkpoint,
)

MODEL_NAMES = ["diffuse", "tsc-diffuse"]


def parse_option(argv=None):
    parser = argparse.ArgumentParser(description="diffusion training")
    parser.add_argument("-a", "--arch", default="diffuse", choices=MODEL_NAMES)
    parser.add_argument("--output", default="output", type=str)
    parser.add_argument("--tag", default=None)
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--opts", default=None, nargs="+")
    parser.add_argument("-j", "--workers", default=8, type=int)
    parser.add_argument("--epochs", default=100, type=int)
    parser.add_argument("--start-epoch", default=0, type=int)
    parser.add_argument("-b", "--batch-size", default=None, type=int)
    parser.add_argument("--lr", default=0.01, type=float)
    parser.add_argument("--momentum", default=0.9, type=float)
    parser.add_argument("--wd", "--weight-decay", default=0.01, type=float,
                        dest="weight_decay")
    parser.add_argument("--max-norm", default=0.0, type=float)
    parser.add_argument("-p", "--print-freq", default=10, type=int)
    parser.add_argument("--resume", default="", type=str)
    parser.add_argument(
        "--init-from", default="", type=str,
        help="checkpoint dir whose 'variables' subtree seeds the model "
             "weights (same-architecture warm start, e.g. re-training "
             "with a new schedule); optimizers and counters start fresh, "
             "unlike --resume",
    )
    parser.add_argument("--seed", default=None, type=int)
    parser.add_argument("--optimizer", default="sgd",
                        choices=["sgd", "adamw", "lars", "lamb"])
    parser.add_argument("--criterion", default="l1",
                        choices=["mae", "l1", "mse", "l2"])
    parser.add_argument("--crop-len", default=1, type=int)
    parser.add_argument("--comp-type", default="pow",
                        choices=["norm", "log", "pow", "none"])
    parser.add_argument("--compute-dtype", default=None,
                        choices=[None, "bfloat16"],
                        help="bf16 model compute (the reference's AMP "
                             "autocast analogue, no GradScaler needed)")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--n-devices", default=None, type=int)
    parser.add_argument("--coordinator", default=None, type=str)
    parser.add_argument("--num-processes", default=None, type=int)
    parser.add_argument("--process-id", default=None, type=int)
    args = parser.parse_args(argv)
    if args.init_from and args.resume:
        parser.error("--init-from and --resume are mutually exclusive: "
                     "one seeds weights only, the other restores the "
                     "full training state")
    config = get_config(args)
    return args, config


def build_model(args, config):
    if args.arch == "diffuse":
        return DiffuSE(
            dilation_cycle_length=config.DILATION_CYCLE_LENGTH,
            hop_length=config.HOP_SAMPLES,
            n_specs=config.N_SPECS,
            num_steps=len(config.NOISE_SCHEDULE),
            residual_channels=config.RESIDUAL_CHANNELS,
            residual_layers=config.RESIDUAL_LAYERS,
        )
    return DiffusionTSCNet(
        num_channel=64,
        num_features=config.N_FFT // 2 + 1,
        num_steps=len(config.NOISE_SCHEDULE),
    )


def init_state(args, config, model, tx, crop_len):
    rngs = {"params": jax.random.PRNGKey(args.seed or 0),
            "dropout": jax.random.PRNGKey(1)}
    # jitted inits: un-jitted flax init dispatches op-by-op (minutes over
    # this host's TPU tunnel)
    if args.arch == "diffuse":
        audio = jnp.zeros((1, crop_len))
        cond = jnp.zeros((1, crop_len // config.HOP_SAMPLES, config.N_SPECS))
        variables = jax.jit(model.init)(rngs, audio, cond, jnp.array([0]))
    else:
        spec = compressed_stft(jnp.zeros((1, crop_len)), config.N_FFT,
                               config.HOP_SAMPLES)
        variables = jax.jit(model.init)(rngs, spec, spec, jnp.array([0.0]))
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    return ModuleState(params=params, extra=extra, opt_state=tx.init(params))


def main(argv=None):
    args, config = parse_option(argv)
    if args.debug:
        jax.config.update("jax_debug_nans", True)
    init_distributed(args.coordinator, args.num_processes, args.process_id)
    mesh = data_parallel_mesh(args.n_devices)
    rank = jax.process_index()
    logger = create_logger(config.OUTPUT, dist_rank=rank, name=args.arch)

    model = build_model(args, config)
    criterion = build_criterion(args.criterion)
    crop_len = config.CROP_FRAMES * config.HOP_SAMPLES * config.CROP_LEN
    noise_schedule = jnp.asarray(config.NOISE_SCHEDULE, jnp.float32)

    train_ds = VoicebankDataset(
        config.DATA.TRAIN_CLEAN_DIR, config.DATA.TRAIN_NOISY_DIR,
        config.HOP_SAMPLES, config.CROP_FRAMES,
    )
    valid_ds = VoicebankDataset(
        config.DATA.TEST_CLEAN_DIR, config.DATA.TEST_NOISY_DIR,
        config.HOP_SAMPLES, config.CROP_FRAMES,
    )
    mk_collator = lambda: Collator(
        config.HOP_SAMPLES, config.CROP_FRAMES, config.CROP_LEN,
        rng=np.random.default_rng(args.seed),
    )
    train_loader = DataLoader(
        train_ds, config.DATA.BATCH_SIZE, mk_collator(), shuffle=True,
        seed=args.seed or 0, shard_id=jax.process_index(),
        num_shards=jax.process_count(), num_workers=args.workers,
    )
    valid_loader = DataLoader(
        valid_ds, config.DATA.BATCH_SIZE, mk_collator(), shuffle=False,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
        num_workers=args.workers,
    )

    iters_per_epoch = max(len(train_loader), 1)
    sched = config.TRAIN.SCHEDULER
    lr = cyclic_cosine_schedule(sched.LR, sched.EPOCHS, iters_per_epoch,
                                sched.CYCLE_LIMIT, sched.WARMUP_EPOCHS)
    probe = init_state(args, config, model, optax.sgd(1e-3), crop_len)
    tx = build_optimizer(args.optimizer, lr, probe.params, args.momentum,
                         args.weight_decay, args.max_norm)
    # reuse the probe's params — only the optimizer state needs rebuilding
    state = probe.replace(opt_state=tx.init(probe.params))
    del probe

    best_loss = 1e8
    start_epoch = args.start_epoch
    if args.init_from:
        variables = load_variables(args.init_from, state.variables())
        state = state.replace(
            params=variables["params"],
            extra={k: v for k, v in variables.items() if k != "params"},
        )
        logger.info(f"=> model weights initialized from {args.init_from} "
                    "(fresh optimizer, epoch 0)")
    if args.resume:
        path = args.resume if args.resume != "auto" else latest_checkpoint(
            config.OUTPUT
        )
        if path:
            state = load_checkpoint(path, state)
            logger.info(f"=> resumed from {path}")

    state = replicate_state(mesh, state)
    # align processes after the compile-heavy init/resume, before the
    # first collective (replaces the reference's post-init dist.barrier)
    barrier("post_init")
    rng_base = jax.random.PRNGKey((args.seed or 0) + 2)
    guard = PreemptionGuard()

    compute_dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else None

    def run_step(state, clean, noisy, step_rng, train):
        if args.arch == "diffuse":
            return diffuse_step(
                state, clean, noisy, noise_schedule, step_rng,
                model=model, criterion=criterion, tx=tx,
                n_fft=config.N_FFT, hop=config.HOP_SAMPLES, train=train,
                compute_dtype=compute_dtype,
            )
        return tsc_diffusion_step(
            state, clean, noisy, noise_schedule, step_rng,
            model=model, tx=tx, comp_type=args.comp_type,
            n_fft=config.N_FFT, hop=config.HOP_SAMPLES, train=train,
            compute_dtype=compute_dtype,
        )

    for epoch in range(start_epoch, args.epochs):
        train_loader.set_epoch(epoch)
        # per-epoch rng stream (function of seed+epoch only) so a
        # killed-and-resumed run replays the continuous run's noise/
        # timestep draws exactly — same contract as main_gan
        rng = jax.random.fold_in(rng_base, epoch)
        meter, batch_meter = AverageMeter(), AverageMeter()
        t_end = time.time()
        for idx, batch in enumerate(train_loader):
            b = batch.audio.shape[0]
            if b == 0 or b % mesh.devices.size != 0:
                continue
            clean, noisy = shard_batch(mesh, batch.audio, batch.noisy)
            rng, step_rng = jax.random.split(rng)
            state, loss = run_step(state, clean, noisy, step_rng, True)
            loss = float(loss)
            if not np.isfinite(loss):
                raise RuntimeError(f"Detected NaN loss at step {idx}.")
            meter.update(loss, b)
            batch_meter.update(time.time() - t_end)
            t_end = time.time()
            if guard.should_stop:
                if rank == 0:
                    save_checkpoint(jax.device_get(state), config.OUTPUT, epoch)
                    logger.info(f"=> preemption checkpoint_{epoch:04d} saved")
                return
            if idx % args.print_freq == 0:
                logger.info(
                    f"Train: [{epoch}/{args.epochs}][{idx}/{iters_per_epoch}]\t"
                    f"time {batch_meter.val:.4f} ({batch_meter.avg:.4f})\t"
                    f"loss {meter}"
                )

        vmeter = AverageMeter()
        for batch in valid_loader:
            b = batch.audio.shape[0]
            if b == 0 or b % mesh.devices.size != 0:
                continue
            clean, noisy = shard_batch(mesh, batch.audio, batch.noisy)
            rng, step_rng = jax.random.split(rng)
            _, loss = run_step(state, clean, noisy, step_rng, False)
            vmeter.update(float(loss), b)

        if rank == 0:
            is_best = vmeter.avg <= best_loss
            best_loss = min(vmeter.avg, best_loss)
            host_state = jax.device_get(state)
            save_checkpoint(host_state, config.OUTPUT, epoch, is_best,
                            variables=host_state.variables())
            logger.info(f"=> saved checkpoint_{epoch:04d} (best={is_best})")
        logger.info(f"Train Loss {meter.avg:.4f}  Valid Loss {vmeter.avg:.4f}")


if __name__ == "__main__":
    main()
