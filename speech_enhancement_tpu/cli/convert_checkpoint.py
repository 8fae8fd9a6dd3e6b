"""Convert a reference PyTorch checkpoint into a servable checkpoint dir.

Handles every checkpoint family the reference produces, auto-detected
from the file's keys:

- **GAN** (main_gan.py:300-310): ``{epoch, arch, gen_state_dict,
  disc_state_dict, ...}`` — both models convert (output parity 3e-6
  relative RMS, tests/test_torch_parity.py) into the ``<out>/variables``
  layout ``cli.inference_gan.load_model`` restores::

      python -m speech_enhancement_tpu.cli.convert_checkpoint \\
          model_best.pth.tar converted_ckpt
      python -m speech_enhancement_tpu.cli.inference_gan \\
          --cfg ... -m converted_ckpt -o enhanced

- **diffusion trainer** (main_diffuse.py:329-336): ``{arch, state_dict,
  ...}`` with arch ``diffuse`` (waveform DiffuSE, models/DiffuSE.py) or
  ``tsc*`` (spectrogram diffusion TSCNet, models/tsc_diffusion.py) —
  serve with ``inference_diffuse -m <out>`` or warm-start
  ``main_diffuse --init-from <out>`` (parity ≤1e-5,
  tests/test_torch_parity.py::test_diffuse_parity/test_tsc_diffusion_parity).

- **standalone cdiffuse** (cdiffuse/learner.py:60-72 ``weights.pt``):
  ``{step, model, ...}`` — the vendored no-GroupNorm DiffuSE variant;
  serve with ``cdiffuse_inference --model-dir <out>``.

Only inference variables are converted — optimizer state is
framework-specific, so a converted checkpoint seeds evaluation or
fine-tuning from epoch 0, not a bit-exact ``--resume`` of the torch run.

``--to-torch`` runs the GAN path in REVERSE: a framework checkpoint dir
(TPU-trained or previously converted) exports to a reference-layout
``.pth.tar`` that the reference's own ``inference_gan.load_model``
restores — so TPU-trained models can be verified inside the reference
stack (round-trip parity ≤3e-5, bit-exact weight round trip,
tests/test_torch_parity.py::test_roundtrip_export).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def _check_tree(name: str, template, converted):
    """Compare one converted variables tree against its eval_shape
    template (structure + shapes), then cast mismatched-dtype leaves
    (e.g. a float64/bf16 torch fine-tune) to the template's dtype so
    the written checkpoint always restores against the fp32 inference
    template."""
    import jax
    import numpy as np

    tmpl_flat = jax.tree_util.tree_flatten_with_path(template)[0]
    conv_flat = jax.tree_util.tree_flatten_with_path(converted)[0]
    tmpl_map = {jax.tree_util.keystr(k): v for k, v in tmpl_flat}
    conv_map = {jax.tree_util.keystr(k): v for k, v in conv_flat}
    missing = sorted(tmpl_map.keys() - conv_map.keys())
    extra = sorted(conv_map.keys() - tmpl_map.keys())
    if missing or extra:
        raise SystemExit(
            f"{name}: converted tree does not match the model "
            f"(missing {missing[:5]}, unexpected {extra[:5]})"
        )
    for key, tmpl_leaf in tmpl_map.items():
        got = conv_map[key]
        if tuple(got.shape) != tuple(tmpl_leaf.shape):
            raise SystemExit(
                f"{name}{key}: shape {tuple(got.shape)} != expected "
                f"{tuple(tmpl_leaf.shape)}"
            )

    def _cast(conv_leaf, tmpl_leaf):
        arr = np.asarray(conv_leaf)
        if arr.dtype != tmpl_leaf.dtype:
            print(f"{name}: casting a {arr.dtype} leaf to "
                  f"{tmpl_leaf.dtype} (template dtype)")
            return arr.astype(tmpl_leaf.dtype)
        return arr

    return jax.tree_util.tree_map(_cast, converted, template)


def _verify_against_template(converted: dict, n_fft: int, hop: int,
                             crop_len: int) -> dict:
    """Shape-check the converted GAN trees against a freshly-built
    GanTrainState — under ``jax.eval_shape`` so nothing compiles or
    executes (free even over a TPU tunnel)."""
    import jax
    import optax

    from speech_enhancement_tpu.models import Discriminator, TSCNet
    from speech_enhancement_tpu.train.gan import create_gan_state

    gen = TSCNet(num_channel=64, num_features=n_fft // 2 + 1)
    disc = Discriminator(ndf=16)
    tmpl_state = jax.eval_shape(
        lambda rng: create_gan_state(
            rng, gen, disc, optax.sgd(1e-3), optax.sgd(1e-3),
            n_fft=n_fft, hop=hop, length=crop_len,
        ),
        jax.ShapeDtypeStruct((2,), "uint32"),
    )
    template = {"gen": tmpl_state.gen.variables(),
                "disc": tmpl_state.disc.variables()}
    for name in converted:
        converted[name] = _check_tree(name, template[name], converted[name])
    return converted


def _infer_diffuse_model(variables: dict, saved_params: dict | None = None):
    """Rebuild the flax DiffuSE whose hyperparameters match a converted
    params tree (everything shape-relevant is recoverable from the
    weights themselves; num_steps only sizes the non-trainable sin/cos
    table so any value gives the same tree).  ``dilation_cycle_length``
    is NOT shape-visible — it comes from ``saved_params`` (the learner
    params the converter preserves as ``params.json``,
    cdiffuse/learner.py:60-72) and falls back to the reference default
    (10 in both models/DiffuSE.py usage and cdiffuse/params.py)."""
    from speech_enhancement_tpu.models import DiffuSE

    saved = saved_params or {}
    params = variables["params"]
    n_layers = sum(1 for k in params if k.startswith("residual"))
    c = params["input_projection"]["kernel"].shape[-1]
    n_specs = params["residual0"]["conditioner_projection"]["kernel"].shape[1]
    L = params["spectrogram_upsampler"]["conv1"].shape[0] // 2
    sched = saved.get("noise_schedule")
    return DiffuSE(
        hop_length=L * L,
        n_specs=n_specs,
        num_steps=len(sched) if sched is not None else 50,
        residual_channels=c,
        residual_layers=n_layers,
        dilation_cycle_length=int(saved.get("dilation_cycle_length", 10)),
        use_groupnorm="dilated_norm" in params["residual0"],
    )


def _verify_diffusion(arch: str, variables: dict, n_fft: int,
                      hop: int) -> dict:
    """eval_shape template check for the diffusion-family conversions."""
    import jax
    import jax.numpy as jnp

    if arch.startswith("tsc"):
        from speech_enhancement_tpu.models import DiffusionTSCNet

        c = variables["params"]["merge_block"]["output_residual"][
            "kernel"].shape[-1]
        model = DiffusionTSCNet(num_channel=c, num_features=n_fft // 2 + 1)
        spec = jax.ShapeDtypeStruct((1, 11, n_fft // 2 + 1), "complex64")
        template = jax.eval_shape(
            lambda r, s: model.init(
                {"params": r, "dropout": r}, s, s, jnp.zeros((1,))
            ),
            jax.ShapeDtypeStruct((2,), "uint32"), spec,
        )
    else:
        model = _infer_diffuse_model(variables)
        audio = jax.ShapeDtypeStruct((1, 4 * model.hop_length), "float32")
        cond = jax.ShapeDtypeStruct((1, 4, model.n_specs), "float32")
        template = jax.eval_shape(
            lambda r, a, c: model.init({"params": r}, a, c,
                                       jnp.zeros((1,))),
            jax.ShapeDtypeStruct((2,), "uint32"), audio, cond,
        )
    return _check_tree(arch, template, variables)


def parse_option(argv=None):
    parser = argparse.ArgumentParser(
        "convert_checkpoint",
        description="reference .pth.tar -> servable orbax checkpoint dir",
    )
    parser.add_argument("checkpoint", help="reference torch checkpoint "
                        "(e.g. model_best.pth.tar)")
    parser.add_argument("output", help="checkpoint directory to create; "
                        "pass it to inference_gan -m")
    parser.add_argument("--n-fft", default=400, type=int)
    parser.add_argument("--hop", default=100, type=int)
    parser.add_argument("--crop-len", default=16000, type=int,
                        help="template init length (verification only)")
    parser.add_argument("--no-verify", action="store_true",
                        help="skip the shape/structure check against a "
                             "freshly-built model template")
    parser.add_argument("--to-torch", action="store_true",
                        help="reverse direction: CHECKPOINT is a framework "
                             "checkpoint dir (written by main_gan or this "
                             "converter) and OUTPUT is a reference-layout "
                             ".pth.tar that the reference inference_gan."
                             "load_model restores directly")
    parser.add_argument("--epoch", default=0, type=int,
                        help="'epoch' field stamped into a --to-torch file")
    parser.add_argument("--arch", default="scp",
                        help="'arch' field stamped into a --to-torch file")
    return parser.parse_args(argv)


def _export_to_torch(args) -> int:
    """TPU -> torch: read a framework GAN checkpoint dir and write the
    reference ``{epoch, arch, gen_state_dict, disc_state_dict}`` .pth.tar
    (main_gan.py:300-310 layout, DDP ``module.`` prefixes included).
    Round-trip parity vs the reference's own ``inference_gan.load_model``
    is pinned by tests/test_torch_parity.py::test_roundtrip_export."""
    import orbax.checkpoint as ocp

    from speech_enhancement_tpu.utils.convert_torch import export_checkpoint

    src = Path(args.checkpoint).resolve() / "variables"
    if not src.exists():
        raise SystemExit(
            f"{args.checkpoint}: no 'variables' subtree — --to-torch needs "
            "a framework checkpoint dir (as written by main_gan or by this "
            "converter), not a torch file"
        )
    variables = ocp.StandardCheckpointer().restore(src)
    if "gen" not in variables:
        raise SystemExit(
            f"{src}: no 'gen' subtree — only GAN checkpoints export to "
            "torch (the reference has no flax-layout diffusion loader to "
            "export for)"
        )
    out = Path(args.output).resolve()
    if out.exists():
        raise SystemExit(f"{out} already exists; refusing to overwrite")
    out.parent.mkdir(parents=True, exist_ok=True)
    export_checkpoint(variables["gen"], variables.get("disc"), str(out),
                      epoch=args.epoch, arch=args.arch)
    print(f"wrote {out} (reference main_gan.py:300-310 layout); the "
          "reference stack loads it with inference_gan.load_model")
    return 0


def main(argv=None) -> int:
    args = parse_option(argv)

    if args.to_torch:
        return _export_to_torch(args)

    import orbax.checkpoint as ocp

    from speech_enhancement_tpu.utils.convert_torch import convert_checkpoint

    converted = convert_checkpoint(args.checkpoint)

    if "gen" not in converted and "disc" not in converted:
        # diffusion family (main_diffuse .pth.tar or cdiffuse weights.pt):
        # write the model variables alone — exactly the subtree
        # inference_diffuse.load_model / cdiffuse_inference.load_model /
        # main_diffuse --init-from restore
        arch = converted["arch"]
        variables = converted["model"]
        if not args.no_verify:
            variables = _verify_diffusion(arch, variables, args.n_fft,
                                          args.hop)
        out = Path(args.output).resolve()
        out.mkdir(parents=True, exist_ok=True)
        target = out / "variables"
        if target.exists():
            raise SystemExit(f"{target} already exists; refusing to "
                             "overwrite")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(target, variables)
        ckptr.wait_until_finished()
        if converted.get("params"):
            # non-shape-visible hyperparameters the source checkpoint
            # carried (cdiffuse dilation_cycle_length + noise schedules);
            # cdiffuse_inference.load_model reads this back
            import json

            (out / "params.json").write_text(
                json.dumps(converted["params"], indent=1)
            )
        serve = ("cdiffuse_inference --model-dir" if arch == "cdiffuse"
                 else f"inference_diffuse -a {arch or 'diffuse'} -m")
        print(f"wrote {target} ({arch} model variables); serve it with\n"
              f"  python -m speech_enhancement_tpu.cli.{serve} {out}\n"
              f"or fine-tune with main_diffuse --init-from {out}")
        return 0
    if "gen" not in converted:
        # disc_state_dict alone (manual surgery) would write a gen-less
        # checkpoint that inference_gan cannot restore — fail loudly at
        # convert time instead of at serve time
        raise SystemExit(
            f"{args.checkpoint}: has disc_state_dict but no gen_state_dict "
            "— nothing servable to convert (inference_gan needs the "
            "generator)"
        )
    if "disc" not in converted:
        # inference restores {gen, disc} as one tree; a gen-only torch file
        # (not produced by the reference trainer, but possible from manual
        # surgery) gets a fresh disc so the checkpoint stays servable
        import jax
        import jax.numpy as jnp

        from speech_enhancement_tpu.models import Discriminator

        print("checkpoint has no disc_state_dict: writing a freshly-"
              "initialized discriminator (inference does not use it)")
        disc = Discriminator(ndf=16)
        mag = jnp.zeros((1, args.crop_len // args.hop + 1,
                         args.n_fft // 2 + 1))
        converted["disc"] = jax.jit(
            lambda r, m: disc.init({"params": r, "dropout": r}, m, m)
        )(jax.random.PRNGKey(0), mag)

    if not args.no_verify:
        converted = _verify_against_template(converted, args.n_fft,
                                             args.hop, args.crop_len)

    out = Path(args.output).resolve()
    out.mkdir(parents=True, exist_ok=True)
    target = out / "variables"
    if target.exists():
        raise SystemExit(f"{target} already exists; refusing to overwrite")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(target, converted)
    ckptr.wait_until_finished()
    print(f"wrote {target} (gen + disc variables); serve it with\n"
          f"  python -m speech_enhancement_tpu.cli.inference_gan "
          f"--cfg <cfg> -m {out} -o <outdir>")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
