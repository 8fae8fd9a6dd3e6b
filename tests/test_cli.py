"""End-to-end CLI tests on a tiny synthetic VoiceBank-style dataset.

These exercise the full entry-point surface: 1-epoch GAN training with
checkpointing, resuming, and inference with the 6-metric report —
the reference's validation-as-testing strategy (SURVEY.md §4) in
miniature.
"""

import os

import numpy as np
import pytest

from speech_enhancement_tpu.data import save_wav


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("vb_cli")
    dirs = {}
    rng = np.random.default_rng(0)
    t = np.arange(20000) / 16000
    # test split is deliberately NOT a batch multiple (batch 2, 3 utts):
    # the ragged validation tail must be padded+masked, never dropped
    for split, n in [("train", 4), ("test", 3)]:
        cdir = root / f"clean_{split}"
        ndir = root / f"noisy_{split}"
        cdir.mkdir()
        ndir.mkdir()
        for i in range(n):
            clean = (0.3 * np.sin(2 * np.pi * (180 + 50 * i) * t)).astype(
                np.float32
            ) * (0.5 + 0.5 * np.sin(2 * np.pi * 2.7 * t))
            noisy = clean + 0.05 * rng.standard_normal(len(t)).astype(np.float32)
            save_wav(cdir / f"p{i:03d}.wav", clean)
            save_wav(ndir / f"p{i:03d}.wav", noisy)
        dirs[split] = (str(cdir), str(ndir))
    cfg = root / "tiny.yaml"
    cfg.write_text(
        f"""
DATA:
  TRAIN_CLEAN_DIR: {dirs['train'][0]}
  TRAIN_NOISY_DIR: {dirs['train'][1]}
  TEST_CLEAN_DIR: {dirs['test'][0]}
  TEST_NOISY_DIR: {dirs['test'][1]}
  BATCH_SIZE: 2
CROP_FRAMES: 40
"""
    )
    return root, str(cfg)


def test_validation_pad_rows_mesh_divisible():
    """Ragged validation tails must pad to a shape that BOTH shards
    evenly over the mesh and matches the full-batch compiled shape —
    even when BATCH_SIZE itself does not divide the mesh (a tail padded
    to exactly BATCH_SIZE=12 on an 8-device mesh crashed shard_batch)."""
    from speech_enhancement_tpu.cli.main_gan import _validation_pad_rows

    # batch_size 12, 8-device mesh: tails and full batches both pad to 16
    assert _validation_pad_rows(5, 12, 8) == 16
    assert _validation_pad_rows(12, 12, 8) == 16
    # divisible config: tails pad to the batch size, full batches untouched
    assert _validation_pad_rows(3, 32, 8) == 32
    assert _validation_pad_rows(32, 32, 8) == 32
    # single device: pad to the batch size exactly
    assert _validation_pad_rows(1, 2, 1) == 2
    # every batch reuses ONE compiled shape regardless of tail size
    assert len({_validation_pad_rows(b, 12, 8) for b in range(1, 13)}) == 1


@pytest.mark.slow
def test_main_gan_one_epoch_and_inference(tiny_dataset, monkeypatch):
    root, cfg = tiny_dataset
    out = root / "out_gan"
    # shrink the models so the CPU test stays fast
    import speech_enhancement_tpu.cli.main_gan as mg

    monkeypatch.setattr(
        mg, "TSCNet",
        lambda num_channel, num_features, fused_attention=False: __import__(
            "speech_enhancement_tpu.models", fromlist=["TSCNet"]
        ).TSCNet(num_channel=8, num_features=num_features,
                 fused_attention=fused_attention),
    )
    monkeypatch.setattr(
        mg, "Discriminator", lambda ndf: __import__(
            "speech_enhancement_tpu.models", fromlist=["Discriminator"]
        ).Discriminator(ndf=4),
    )
    mg.main([
        "-a", "scp", "--cfg", cfg, "--output", str(out), "--epochs", "1",
        "--seed", "3", "-j", "2", "-p", "1", "--n-devices", "1",
        # two-deep deferred-disc queue: with a tiny dataset most disc
        # updates are applied by the end-of-epoch drain — covers the lag
        # machinery shared with async (lag 1) plus the drain edge
        "--step-mode", "pipelined",
        "--precision", "bf16",  # the fast AMP-analogue training mode
    ])
    ckpt = out / "scp" / "default" / "checkpoint_0000"
    assert ckpt.exists()
    assert (out / "scp" / "default" / "model_best").exists()

    import speech_enhancement_tpu.cli.inference_gan as ig

    monkeypatch.setattr(
        ig, "TSCNet",
        lambda num_channel, num_features, fused_attention=False: __import__(
            "speech_enhancement_tpu.models", fromlist=["TSCNet"]
        ).TSCNet(num_channel=8, num_features=num_features,
                 fused_attention=fused_attention),
    )
    monkeypatch.setattr(
        ig, "Discriminator", lambda ndf: __import__(
            "speech_enhancement_tpu.models", fromlist=["Discriminator"]
        ).Discriminator(ndf=4),
    )
    enh_out = root / "enhanced"
    ig.main([
        "--cfg", cfg, "-m", str(ckpt), "-o", str(enh_out), "--save",
    ])
    saved = list((enh_out).rglob("*.wav"))
    assert len(saved) == 3

    # --validate-epochs without --start/--end sweeps the checkpoints
    # actually present (here: just checkpoint_0000)
    ig.main([
        "--cfg", cfg, "-m", str(ckpt.parent), "-o", str(root / "sweep"),
        "--validate-epochs",
    ])


def test_validate_epochs_empty_range_fails_loudly(tiny_dataset, tmp_path):
    """An explicit --start/--end sweep whose checkpoints are all missing
    must raise, not print 'Best epoch: 0, best PESQ: 0.0' and exit 0
    (the no-restorable-checkpoints guard covers BOTH epoch-selection
    branches)."""
    import speech_enhancement_tpu.cli.inference_gan as ig

    root, cfg = tiny_dataset
    empty = tmp_path / "no_ckpts"
    empty.mkdir()
    for extra in ([], ["--start", "0", "--end", "5"]):
        with pytest.raises(SystemExit, match="no restorable"):
            ig.main(["--cfg", cfg, "-m", str(empty),
                     "-o", str(tmp_path / "out"), "--validate-epochs",
                     *extra])


def test_step_mode_flag(tiny_dataset):
    """--step-mode selection and the --async-disc alias/conflict rules."""
    from speech_enhancement_tpu.cli.main_gan import parse_option

    root, cfg = tiny_dataset
    base = ["-a", "scp", "--cfg", cfg, "--output", str(root / "o")]
    args, _ = parse_option(base)
    # pipelined is the measured-fastest default, quality-transparent on
    # the proxy A/B (docs/TRAIN_BENCH.md, docs/quality_proxy_run.md)
    assert args.step_mode == "pipelined" and args.async_disc
    assert args.disc_lag == 2
    args, _ = parse_option(base + ["--step-mode", "fused"])
    assert args.step_mode == "fused" and not args.async_disc
    assert args.disc_lag == 0
    args, _ = parse_option(base + ["--step-mode", "two-phase"])
    assert not args.async_disc and args.disc_lag == 0
    args, _ = parse_option(base + ["--step-mode", "pipelined"])
    assert args.async_disc and args.disc_lag == 2
    args, _ = parse_option(base + ["--async-disc"])
    assert args.step_mode == "async" and args.disc_lag == 1
    with pytest.raises(SystemExit):
        parse_option(base + ["--async-disc", "--step-mode", "fused"])


@pytest.mark.slow
def test_main_gan_resume_auto(tiny_dataset, monkeypatch):
    """--resume auto restores epoch/best_loss and continues training
    (main_gan.py:196-215 resume semantics)."""
    root, cfg = tiny_dataset
    out = root / "out_resume"
    import speech_enhancement_tpu.cli.main_gan as mg

    monkeypatch.setattr(
        mg, "TSCNet",
        lambda num_channel, num_features, fused_attention=False: __import__(
            "speech_enhancement_tpu.models", fromlist=["TSCNet"]
        ).TSCNet(num_channel=8, num_features=num_features,
                 fused_attention=fused_attention),
    )
    monkeypatch.setattr(
        mg, "Discriminator", lambda ndf: __import__(
            "speech_enhancement_tpu.models", fromlist=["Discriminator"]
        ).Discriminator(ndf=4),
    )
    common = ["-a", "cmgan", "--cfg", cfg, "--output", str(out),
              "--seed", "3", "-j", "2", "-p", "1", "--n-devices", "1"]
    mg.main(common + ["--epochs", "1"])
    assert (out / "cmgan" / "default" / "checkpoint_0000").exists()
    mg.main(common + ["--epochs", "2", "--resume", "auto"])
    # resumed run starts at epoch 1 and writes checkpoint_0001
    assert (out / "cmgan" / "default" / "checkpoint_0001").exists()


@pytest.mark.slow
def test_main_gan_resume_bit_exact(tiny_dataset, monkeypatch):
    """A run killed after an end-of-epoch checkpoint and resumed with
    `--resume auto` must produce BIT-IDENTICAL final variables to a
    continuous run: the loader (set_epoch), the schedule (step-indexed
    opt_state in the checkpoint) and — since the per-epoch fold_in rng —
    the dropout/disc rng stream are all functions of (seed, epoch) only."""
    import jax
    import orbax.checkpoint as ocp

    root, cfg = tiny_dataset
    import speech_enhancement_tpu.cli.main_gan as mg

    for name, fn in (
        ("TSCNet", lambda num_channel, num_features, fused_attention=False:
            __import__("speech_enhancement_tpu.models",
                       fromlist=["TSCNet"]).TSCNet(
                num_channel=8, num_features=num_features,
                fused_attention=fused_attention)),
        ("Discriminator", lambda ndf: __import__(
            "speech_enhancement_tpu.models",
            fromlist=["Discriminator"]).Discriminator(ndf=4)),
    ):
        monkeypatch.setattr(mg, name, fn)

    def run(out, argv):
        return mg.main(["-a", "cmgan", "--cfg", cfg, "--output", str(out),
                        "--seed", "3", "-j", "2", "-p", "1",
                        "--n-devices", "1", "--epochs", "3"] + argv)

    # continuous control: 3 epochs in one process
    run(root / "out_cont", [])

    # interrupted arm: same 3-epoch schedule, killed right after the
    # epoch-0 checkpoint lands (monkeypatched save raises — the moral
    # equivalent of SIGKILL between epochs), then resumed
    real_save = mg.save_checkpoint

    class Killed(Exception):
        pass

    def save_and_die(state, output, epoch, *a, **kw):
        real_save(state, output, epoch, *a, **kw)
        if epoch == 0:
            raise Killed

    monkeypatch.setattr(mg, "save_checkpoint", save_and_die)
    with pytest.raises(Killed):
        run(root / "out_kill", [])
    monkeypatch.setattr(mg, "save_checkpoint", real_save)
    run(root / "out_kill", ["--resume", "auto"])

    ckptr = ocp.StandardCheckpointer()
    a = ckptr.restore(
        (root / "out_cont" / "cmgan" / "default" / "checkpoint_0002" /
         "variables").resolve())
    b = ckptr.restore(
        (root / "out_kill" / "cmgan" / "default" / "checkpoint_0002" /
         "variables").resolve())
    mism = [
        p for (p, x), (_, y) in zip(
            jax.tree_util.tree_flatten_with_path(a)[0],
            jax.tree_util.tree_flatten_with_path(b)[0])
        if not (x == y).all()
    ]
    assert not mism, f"resume diverged from continuous at {mism[:5]}"


@pytest.mark.slow
def test_main_gan_init_from_variables(tiny_dataset, monkeypatch):
    """--init-from seeds the model weights from a checkpoint's
    'variables' subtree (the fine-tune path for cli.convert_checkpoint
    outputs) with fresh optimizers, and is mutually exclusive with
    --resume."""
    import jax
    import numpy as np

    import speech_enhancement_tpu.cli.main_gan as mg
    from speech_enhancement_tpu.utils import load_variables

    root, cfg = tiny_dataset
    out = root / "out_init_src"
    monkeypatch.setattr(
        mg, "TSCNet",
        lambda num_channel, num_features, fused_attention=False: __import__(
            "speech_enhancement_tpu.models", fromlist=["TSCNet"]
        ).TSCNet(num_channel=8, num_features=num_features,
                 fused_attention=fused_attention),
    )
    monkeypatch.setattr(
        mg, "Discriminator", lambda ndf: __import__(
            "speech_enhancement_tpu.models", fromlist=["Discriminator"]
        ).Discriminator(ndf=4),
    )
    common = ["-a", "cmgan", "--cfg", cfg, "--seed", "3", "-j", "2",
              "-p", "1", "--n-devices", "1"]
    mg.main(common + ["--output", str(out), "--epochs", "1"])
    src = out / "cmgan" / "default" / "checkpoint_0000"
    assert src.exists()

    # spy on the state entering the train loop: --init-from must have
    # replaced params with the checkpoint's variables, with step 0
    captured = {}
    real_rep = mg.replicate_state

    def spy(mesh, state):
        captured["state"] = state
        return real_rep(mesh, state)

    monkeypatch.setattr(mg, "replicate_state", spy)
    # different seed: fresh-init weights could not coincide by accident
    mg.main(["-a", "cmgan", "--cfg", cfg, "--seed", "5", "-j", "2",
             "-p", "1", "--n-devices", "1",
             "--output", str(root / "out_init_dst"), "--epochs", "1",
             "--init-from", str(src)])
    state = captured["state"]
    template = {"gen": state.gen.variables(), "disc": state.disc.variables()}
    expected = load_variables(str(src), jax.device_get(template))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(state.gen.params), expected["gen"]["params"],
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
    assert int(state.gen.step) == 0  # fresh optimizer/step, not a resume
    assert (root / "out_init_dst" / "cmgan" / "default"
            / "checkpoint_0000").exists()

    with pytest.raises(SystemExit):  # parser.error -> SystemExit(2)
        mg.main(common + ["--output", str(root / "out_both"),
                          "--epochs", "1", "--init-from", str(src),
                          "--resume", "auto"])


@pytest.mark.slow
def test_main_diffuse_tsc_one_epoch(tiny_dataset, monkeypatch, capsys):
    root, cfg = tiny_dataset
    out = root / "out_diff"
    import speech_enhancement_tpu.cli.main_diffuse as md

    real_build = md.build_model

    def small_build(args, config):
        from speech_enhancement_tpu.models import DiffusionTSCNet

        return DiffusionTSCNet(
            num_channel=8, num_features=config.N_FFT // 2 + 1,
            num_steps=len(config.NOISE_SCHEDULE),
        )

    monkeypatch.setattr(md, "build_model", small_build)
    md.main([
        "-a", "tsc-diffuse", "--cfg", cfg, "--output", str(out),
        "--epochs", "1", "--seed", "3", "-j", "2", "-p", "1",
        "--n-devices", "1", "--optimizer", "adamw", "--lr", "1e-4",
    ])
    src = out / "tsc-diffuse" / "default" / "checkpoint_0000"
    assert src.exists()

    # --init-from warm-starts a new run from the variables subtree
    import jax

    from speech_enhancement_tpu.utils import load_variables

    captured = {}
    real_rep = md.replicate_state

    def spy(mesh, state):
        captured["state"] = state
        return real_rep(mesh, state)

    monkeypatch.setattr(md, "replicate_state", spy)
    md.main([
        "-a", "tsc-diffuse", "--cfg", cfg,
        "--output", str(root / "out_diff_warm"),
        "--epochs", "1", "--seed", "5", "-j", "2", "-p", "1",
        "--n-devices", "1", "--optimizer", "adamw", "--lr", "1e-4",
        "--init-from", str(src),
    ])
    state = captured["state"]
    expected = load_variables(str(src), jax.device_get(state.variables()))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(state.params), expected["params"],
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0

    # the inference CLI samples the trained checkpoint end to end
    # (args.seed was missing from its parser once — load_model crashed on
    # every real invocation; this pins the whole entry point)
    import speech_enhancement_tpu.cli.inference_diffuse as idf

    monkeypatch.setattr(idf, "build_model", small_build)
    idf.main([
        "-a", "tsc-diffuse", "--cfg", cfg, "-m", str(src),
        "-o", str(root / "diff_enhanced"), "--fast", "--save",
    ])
    saved = list((root / "diff_enhanced").rglob("*.wav"))
    assert len(saved) == 3

    # --validate-epochs without --start/--end sweeps the checkpoints
    # actually present (same hardening as inference_gan); a state-only
    # preemption checkpoint mid-sweep is skipped (not crashed on); an
    # empty dir fails loudly
    (src.parent / "checkpoint_0001" / "state").mkdir(parents=True)
    idf.main([
        "-a", "tsc-diffuse", "--cfg", cfg, "-m", str(src.parent),
        "-o", str(root / "diff_sweep"), "--fast", "--validate-epochs",
    ])
    sweep_out = capsys.readouterr().out
    assert "skipping epoch 1" in sweep_out
    assert "Epoch: 0" in sweep_out
    assert "Best epoch: 0" in sweep_out
    empty = root / "no_diff_ckpts"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no restorable"):
        idf.main([
            "-a", "tsc-diffuse", "--cfg", cfg, "-m", str(empty),
            "-o", str(root / "diff_sweep2"), "--fast", "--validate-epochs",
        ])
