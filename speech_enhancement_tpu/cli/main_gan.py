"""SCP-GAN / CMGAN training entry point.

CLI mirror of the reference's ``main_gan.py`` (flags, arch choices
['scp','cp','sc','cmgan'], gen-first gating, disc lr = 2x gen lr,
best-by-validation-disc-loss checkpointing) rebuilt on the functional
core: one process drives all local devices through mesh sharding —
there is no mp.spawn / process-group plumbing to configure; multi-host
runs pass --num-processes/--process-id for the jax.distributed rendezvous.

Usage:
  python -m speech_enhancement_tpu.cli.main_gan -a scp \
      --cfg speech_enhancement_tpu/config/scp.yaml --output out --epochs 100
"""

from __future__ import annotations

import argparse
import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.config import get_config
from speech_enhancement_tpu.data import Collator, DataLoader, VoicebankDataset
from speech_enhancement_tpu.metrics.pesq import batch_pesq_raw
from speech_enhancement_tpu.models import Discriminator, TSCNet
from speech_enhancement_tpu.parallel import (
    barrier,
    data_parallel_mesh,
    init_distributed,
    replicate_state,
    shard_batch,
)
from speech_enhancement_tpu.train import (
    build_criterion,
    build_optimizer,
    create_gan_state,
    cyclic_cosine_schedule,
    gan_discriminator_step,
    gan_eval_step,
    gan_generator_step,
    make_fused_gan_train_step,
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

MODEL_NAMES = ["scp", "cp", "sc", "cmgan"]


def host_validation_disc_loss(d_real, d_fake, q_est,
                              crit_name: str = "mse") -> float:
    """Host-side twin of the reference validate_gan discriminator metric
    L_C + L_E: criterion(d_real, 1) + criterion(d_fake, q)
    (function.py:425-429).  Computed in numpy because its inputs already
    live on the host (d_real/d_fake come back with the eval step, q_est
    from the host PESQ engine) and an eager device call would cost a
    ~30 ms tunnel dispatch per validation batch.  Parity with the device
    criterion (train.build_criterion) for both names is pinned by
    tests/test_train_gan.py::test_host_validation_disc_loss_matches_device.
    """
    d_real = np.asarray(d_real, np.float32)
    d_fake = np.asarray(d_fake, np.float32)
    q = np.asarray(q_est, np.float32)
    if crit_name in ("mae", "l1"):
        return float(np.mean(np.abs(d_real - np.float32(1.0)))
                     + np.mean(np.abs(d_fake - q)))
    if crit_name in ("mse", "l2"):
        return float(np.mean((d_real - np.float32(1.0)) ** 2)
                     + np.mean((d_fake - q) ** 2))
    raise ValueError(f"invalid criterion {crit_name!r}")


def _validation_pad_rows(b: int, batch_size: int, mesh_size: int) -> int:
    """Rows a validation batch of ``b`` real utterances is padded to:
    the full batch size rounded up to the mesh multiple, so every
    validation batch (a) shards evenly over the mesh even when
    BATCH_SIZE itself does not, and (b) reuses ONE compiled shape."""
    return -(-max(b, batch_size) // mesh_size) * mesh_size


def parse_option(argv=None):
    parser = argparse.ArgumentParser(description="Speech enhancement training")
    parser.add_argument("-a", "--arch", default="cmgan", choices=MODEL_NAMES)
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
             "weights (e.g. a cli.convert_checkpoint output, to fine-tune "
             "a reference-trained torch model on TPU); optimizers, epoch "
             "counter and best-loss start fresh — unlike --resume, which "
             "restores the full training state",
    )
    parser.add_argument("--seed", default=None, type=int)
    parser.add_argument("--optimizer", default="sgd",
                        choices=["sgd", "adamw", "lars", "lamb"])
    parser.add_argument("--criterion", default="l1",
                        choices=["mae", "l1", "mse", "l2"])
    parser.add_argument("--crop-len", default=1, type=int)
    parser.add_argument("--gen-first", action="store_true")
    parser.add_argument(
        "--async-disc", action="store_true",
        help="alias for --step-mode async",
    )
    parser.add_argument(
        "--step-mode", default=None,
        choices=["two-phase", "async", "pipelined", "fused"],
        help="train-step dispatch: two jitted phases with synchronous host "
             "PESQ labels ('two-phase'), the one-deep label pipeline "
             "('async': discriminator update lags one step; reference "
             "alternation still serializes gen -> host PESQ -> disc), the "
             "two-deep pipeline ('pipelined': discriminator update lags "
             "TWO steps, taking the host PESQ labels fully off the "
             "critical path — 1.7x over async on v5e, at the cost of the "
             "generator's gan_loss seeing disc params one extra update "
             "stale; quality-checked on the proxy corpus, "
             "docs/TRAIN_BENCH.md), or one fused jit with io_callback "
             "labels ('fused'; needs a backend with host callbacks — "
             "axon-tunneled chips lack them).  Default: pipelined — the "
             "fastest mode, quality-transparent on the proxy A/B "
             "(per-epoch PESQ within 0.004 of async, "
             "docs/quality_proxy_run.md)",
    )
    parser.add_argument("--comp-type", default="pow",
                        choices=["norm", "log", "pow", "none"])
    parser.add_argument(
        "--precision", default="fp32", choices=["fp32", "bf16"],
        help="bf16: generator fwd/bwd in bfloat16 with fp32 master "
             "params/losses (the AMP analogue; 1.36x step speedup on "
             "v5e, docs/TRAIN_BENCH.md)",
    )
    parser.add_argument(
        "--fused-attention", action="store_true",
        help="Pallas fused time-axis attention in the generator "
             "(fused flash-style Pallas backward; logits never touch HBM "
             "in either direction, any crop length trains)",
    )
    parser.add_argument("--debug", action="store_true",
                        help="enable jax_debug_nans")
    parser.add_argument("--n-devices", default=None, type=int)
    parser.add_argument("--coordinator", default=None, type=str)
    parser.add_argument("--num-processes", default=None, type=int)
    parser.add_argument("--process-id", default=None, type=int)
    args = parser.parse_args(argv)
    if args.step_mode is None:
        # pipelined is the fastest measured on v5e (208-233 ms/step at 1 s
        # crops vs 358-375 async — the two-deep queue takes the host PESQ
        # label wait fully off the critical path, docs/TRAIN_BENCH.md) and
        # quality-transparent on the proxy A/B (per-epoch PESQ within
        # 0.004 of async, docs/quality_proxy_run.md).  --async-disc stays
        # as an explicit alias for the reference-faithful one-deep mode.
        args.step_mode = "async" if args.async_disc else "pipelined"
    elif args.async_disc and args.step_mode != "async":
        parser.error("--async-disc conflicts with --step-mode "
                     f"{args.step_mode}")
    args.async_disc = args.step_mode in ("async", "pipelined")
    # deferred-disc-update queue depth: 1 hides PESQ behind the next gen
    # DISPATCH only (alternation still waits on the labels); 2 gives the
    # host a full gen-step of device time so fut.result() returns
    # immediately (docs/TRAIN_BENCH.md round-4b cost split)
    args.disc_lag = {"async": 1, "pipelined": 2}.get(args.step_mode, 0)
    if args.init_from and args.resume:
        parser.error("--init-from and --resume are mutually exclusive: "
                     "one seeds weights only, the other restores the "
                     "full training state")
    config = get_config(args)
    return args, config


def main(argv=None):
    args, config = parse_option(argv)
    if args.debug:
        jax.config.update("jax_debug_nans", True)
    if args.seed is not None:
        np.random.seed(args.seed)

    init_distributed(args.coordinator, args.num_processes, args.process_id)
    mesh = data_parallel_mesh(args.n_devices)
    rank = jax.process_index()
    logger = create_logger(config.OUTPUT, dist_rank=rank, name=args.arch)
    logger.info(f"devices: {mesh.devices.size}, arch: {args.arch}")

    gen_model = TSCNet(num_channel=64, num_features=config.N_FFT // 2 + 1,
                       fused_attention=args.fused_attention)
    disc_model = Discriminator(ndf=16)
    # the reference hardcodes MSE for the GAN path (main_gan.py:190)
    crit_name = "mse"
    criterion = build_criterion(crit_name)
    compute_dtype = jnp.bfloat16 if args.precision == "bf16" else None

    crop_len = config.CROP_FRAMES * config.HOP_SAMPLES * config.CROP_LEN

    train_ds = VoicebankDataset(
        config.DATA.TRAIN_CLEAN_DIR, config.DATA.TRAIN_NOISY_DIR,
        config.HOP_SAMPLES, config.CROP_FRAMES,
    )
    valid_ds = VoicebankDataset(
        config.DATA.TEST_CLEAN_DIR, config.DATA.TEST_NOISY_DIR,
        config.HOP_SAMPLES, config.CROP_FRAMES,
    )
    batch_size = config.DATA.BATCH_SIZE
    mk_collator = lambda labels: Collator(
        config.HOP_SAMPLES, config.CROP_FRAMES, config.CROP_LEN,
        rng=np.random.default_rng(args.seed),
        precompute_labels=labels,
    )
    train_loader = DataLoader(
        train_ds, batch_size, mk_collator(True), shuffle=True,
        seed=args.seed or 0, shard_id=jax.process_index(),
        num_shards=jax.process_count(), num_workers=args.workers,
    )
    valid_loader = DataLoader(
        valid_ds, batch_size, mk_collator(True), shuffle=False,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
        num_workers=args.workers,
        drop_last=False,  # validate every utterance (main_gan.py:287-298);
        # the eval loop pads ragged tails to the mesh multiple and masks
    )

    iters_per_epoch = max(len(train_loader), 1)
    sched = config.TRAIN.SCHEDULER
    gen_sched = cyclic_cosine_schedule(
        sched.LR, sched.EPOCHS, iters_per_epoch, sched.CYCLE_LIMIT,
        sched.WARMUP_EPOCHS,
    )
    disc_sched = cyclic_cosine_schedule(
        sched.LR, sched.EPOCHS, iters_per_epoch, sched.CYCLE_LIMIT,
        sched.WARMUP_EPOCHS, scale=2.0,  # disc lr = 2x (main_gan.py:192)
    )

    import optax

    probe = create_gan_state(
        jax.random.PRNGKey(args.seed or 0), gen_model, disc_model,
        optax.sgd(1e-3), optax.sgd(1e-3), length=crop_len,
    )
    gen_tx = build_optimizer(args.optimizer, gen_sched, probe.gen.params,
                             args.momentum, args.weight_decay, args.max_norm)
    disc_tx = build_optimizer(args.optimizer, disc_sched, probe.disc.params,
                              args.momentum, args.weight_decay, args.max_norm)
    # reuse the probe's (identically-seeded) params — re-initializing
    # both models just to swap the optimizer would pay two more full
    # inits at startup; only the optimizer states need rebuilding
    state = probe.replace(
        gen=probe.gen.replace(opt_state=gen_tx.init(probe.gen.params)),
        disc=probe.disc.replace(opt_state=disc_tx.init(probe.disc.params)),
    )
    del probe

    best_loss = 1e8
    start_epoch = args.start_epoch
    if args.init_from:
        variables = load_variables(
            args.init_from,
            {"gen": state.gen.variables(), "disc": state.disc.variables()},
        )
        state = state.replace(
            gen=state.gen.replace(
                params=variables["gen"]["params"],
                extra={k: v for k, v in variables["gen"].items()
                       if k != "params"},
            ),
            disc=state.disc.replace(
                params=variables["disc"]["params"],
                extra={k: v for k, v in variables["disc"].items()
                       if k != "params"},
            ),
        )
        logger.info(f"=> model weights initialized from {args.init_from} "
                    "(fresh optimizers, epoch 0)")
    if args.resume:
        path = args.resume
        if path == "auto":
            path = latest_checkpoint(config.OUTPUT)
        if path:
            state = load_checkpoint(path, state)
            start_epoch = int(state.epoch)
            best_loss = float(state.best_loss)
            logger.info(f"=> resumed from {path} (epoch {start_epoch})")

    state = replicate_state(mesh, state)
    # align processes after the compile-heavy init/resume and before the
    # first collective (replaces dist.barrier(), main_gan.py:142; see
    # parallel.barrier for why skew at the first all-reduce is fatal)
    barrier("post_init")
    rng_base = jax.random.PRNGKey((args.seed or 0) + 1)
    loss_weights = tuple(config.LOSS_WEIGHTS)

    from concurrent.futures import ThreadPoolExecutor

    # pipelined mode keeps two label jobs in flight (disc lag 2)
    label_pool = ThreadPoolExecutor(max_workers=max(1, args.disc_lag))
    guard = PreemptionGuard()

    fused_steps = {}

    def get_fused_step(active: bool):
        # one compile per gan_active value (flips once at 0.3*epochs)
        if active not in fused_steps:
            fused_steps[active] = make_fused_gan_train_step(
                gen_model=gen_model, disc_model=disc_model,
                gen_tx=gen_tx, disc_tx=disc_tx, arch=args.arch,
                criterion=criterion, comp_type=args.comp_type,
                gan_active=active, loss_weights=loss_weights,
                compute_dtype=compute_dtype,
            )
        return fused_steps[active]

    def emergency_checkpoint(epoch):
        if rank == 0:
            host_state = jax.device_get(state)
            host_state = host_state.replace(best_loss=best_loss, epoch=epoch)
            save_checkpoint(host_state, config.OUTPUT, epoch)
            logger.info(
                f"=> preemption checkpoint_{epoch:04d} saved; resume with "
                f"--resume auto"
            )

    def compute_q_est(batch, aux):
        est = np.asarray(aux.est_audio)
        return jnp.asarray(
            (batch_pesq_raw(batch.audio[:, : est.shape[1]], est) - 1.0) / 3.5,
            jnp.float32,
        )

    for epoch in range(start_epoch, args.epochs):
        train_loader.set_epoch(epoch)
        # per-epoch rng stream, a function of (seed, epoch) ONLY — like
        # set_epoch for the loader, this makes `--resume auto` rng-
        # continuous: a killed-and-resumed run replays the exact dropout/
        # disc-rng stream a continuous run would have used (pinned
        # bit-exact by tests/test_cli.py::test_main_gan_resume_bit_exact)
        rng = jax.random.fold_in(rng_base, epoch)
        gan_active = epoch >= int(args.epochs * 0.3) or not args.gen_first
        gen_meter, disc_meter, batch_meter = (
            AverageMeter(), AverageMeter(), AverageMeter(),
        )
        t_end = time.time()
        # deferred disc updates: each entry is
        # (aux, q_est future, q_clean, q_noisy, rng, b); async keeps one,
        # pipelined keeps two (labels get a full gen-step to finish)
        pending = deque()
        for idx, batch in enumerate(train_loader):
            if batch.audio.shape[0] == 0:
                continue
            b = batch.audio.shape[0]
            if b % mesh.devices.size != 0:
                continue  # ragged tail: skip (drop_last semantics)
            clean, noisy = shard_batch(mesh, batch.audio, batch.noisy)
            rng, step_rng, disc_rng = jax.random.split(rng, 3)

            # apply the oldest deferred discriminator update once the queue
            # is full (its PESQ labels were computed while newer generator
            # steps ran on the device)
            if len(pending) >= args.disc_lag > 0:
                p_aux, q_fut, q_c, q_n, p_rng, p_b = pending.popleft()
                state, disc_loss = gan_discriminator_step(
                    state, p_aux, q_fut.result(), q_c, q_n, p_rng,
                    disc_model=disc_model, arch=args.arch,
                    criterion=criterion, disc_tx=disc_tx,
                )
                disc_meter.update(float(disc_loss), p_b)

            if args.step_mode == "fused":
                # single dispatch: generator update + io_callback PESQ
                # labels + discriminator update in one compiled program
                step = get_fused_step(gan_active)
                state, metrics = step(
                    state, clean, noisy, step_rng,
                    jnp.asarray(batch.pesq_clean),
                    jnp.asarray(batch.pesq_noisy),
                )
                gen_meter.update(float(metrics["loss"]), b)
                if gan_active:
                    disc_meter.update(float(metrics["disc_loss"]), b)
                batch_meter.update(time.time() - t_end)
                t_end = time.time()
                if guard.should_stop:
                    emergency_checkpoint(epoch)
                    return
                if idx % args.print_freq == 0:
                    logger.info(
                        f"Train: [{epoch}/{args.epochs}]"
                        f"[{idx}/{iters_per_epoch}]\t"
                        f"time {batch_meter.val:.4f} ({batch_meter.avg:.4f})\t"
                        f"generator loss {gen_meter}\t"
                        f"discriminator loss {disc_meter}"
                    )
                continue

            state, aux = gan_generator_step(
                state, clean, noisy, step_rng,
                gen_model=gen_model, disc_model=disc_model, arch=args.arch,
                criterion=criterion, comp_type=args.comp_type,
                gan_active=gan_active, loss_weights=loss_weights,
                gen_tx=gen_tx, compute_dtype=compute_dtype,
            )
            if gan_active:
                q_clean = jnp.asarray(batch.pesq_clean)
                q_noisy = jnp.asarray(batch.pesq_noisy)
                if args.async_disc:
                    pending.append((
                        aux,
                        label_pool.submit(compute_q_est, batch, aux),
                        q_clean, q_noisy, disc_rng, b,
                    ))
                else:
                    q_est = compute_q_est(batch, aux)
                    state, disc_loss = gan_discriminator_step(
                        state, aux, q_est, q_clean, q_noisy, disc_rng,
                        disc_model=disc_model, arch=args.arch,
                        criterion=criterion, disc_tx=disc_tx,
                    )
                    disc_meter.update(float(disc_loss), b)
            gen_meter.update(float(aux.metrics["loss"]), b)
            batch_meter.update(time.time() - t_end)
            t_end = time.time()
            if guard.should_stop:
                emergency_checkpoint(epoch)
                return
            if idx % args.print_freq == 0:
                logger.info(
                    f"Train: [{epoch}/{args.epochs}][{idx}/{iters_per_epoch}]\t"
                    f"time {batch_meter.val:.4f} ({batch_meter.avg:.4f})\t"
                    f"generator loss {gen_meter}\t"
                    f"discriminator loss {disc_meter}"
                )

        # flush the trailing deferred discriminator updates — every batch's
        # disc update is applied exactly once per epoch regardless of lag
        while pending:
            p_aux, q_fut, q_c, q_n, p_rng, p_b = pending.popleft()
            state, disc_loss = gan_discriminator_step(
                state, p_aux, q_fut.result(), q_c, q_n, p_rng,
                disc_model=disc_model, arch=args.arch,
                criterion=criterion, disc_tx=disc_tx,
            )
            disc_meter.update(float(disc_loss), p_b)

        # ---- validation (function.py:346-451).  The reference validates
        # EVERY utterance (main_gan.py:287-298): ragged tail batches are
        # padded to the mesh multiple with repeated rows and the pad rows
        # are masked out exactly (per-example losses), never dropped —
        # the best-checkpoint decision must see the full validation set.
        vg, vd = AverageMeter(), AverageMeter()
        for batch in valid_loader:
            b = batch.audio.shape[0]
            if b == 0:
                continue
            b_pad = _validation_pad_rows(b, batch_size, mesh.devices.size)
            if b_pad != b:
                idx = np.arange(b_pad) % b  # cyclic repeats of real rows
                audio, noisy_np = batch.audio[idx], batch.noisy[idx]
            else:
                audio, noisy_np = batch.audio, batch.noisy
            clean, noisy = shard_batch(mesh, audio, noisy_np)
            losses, aux = gan_eval_step(
                state, clean, noisy,
                gen_model=gen_model, disc_model=disc_model, arch=args.arch,
                criterion=criterion, comp_type=args.comp_type,
                gan_active=gan_active, loss_weights=loss_weights,
                per_example=True,
            )
            est = np.asarray(aux.est_audio)[:b]
            q_est = (batch_pesq_raw(audio[:b, : est.shape[1]], est) - 1.0) / 3.5
            d_fake = np.asarray(aux.metrics["d_fake"])[:b]
            d_real = np.asarray(aux.metrics["d_real"])[:b]
            # validation disc loss L_C + L_E through the configured
            # criterion (function.py:425-429; the reference computes it
            # regardless of gen-first/gan_active, and so do we)
            disc_loss = host_validation_disc_loss(d_real, d_fake, q_est,
                                                  crit_name)
            vg.update(float(np.mean(np.asarray(losses["loss"])[:b])), b)
            vd.update(disc_loss, b)

        if rank == 0:
            is_best = vd.avg <= best_loss
            best_loss = min(vd.avg, best_loss)
            host_state = jax.device_get(state)
            host_state = host_state.replace(
                best_loss=best_loss, epoch=epoch + 1
            )
            variables = {
                "gen": host_state.gen.variables(),
                "disc": host_state.disc.variables(),
            }
            save_checkpoint(host_state, config.OUTPUT, epoch, is_best,
                            variables=variables)
            logger.info(f"=> saved checkpoint_{epoch:04d} (best={is_best})")
        logger.info(
            f"Train Gen {gen_meter.avg:.3f}  Train Disc {disc_meter.avg:.3f}  "
            f"Valid Gen {vg.avg:.3f}  Valid Disc {vd.avg:.3f}"
        )


if __name__ == "__main__":
    main()
