"""Convert a reference PyTorch checkpoint into a servable checkpoint dir.

The reference saves ``{epoch, arch, gen_state_dict, disc_state_dict,
optimizer, ...}`` torch dicts (reference main_gan.py:300-310) and its
``inference_gan.py:60-72`` restores ``gen_state_dict`` (stripping the DDP
``module.`` prefix).  This CLI is the migration path for users holding
such checkpoints: it converts both models with
:mod:`speech_enhancement_tpu.utils.convert_torch` (output parity 3e-6
relative RMS, tests/test_torch_parity.py) and writes an orbax
``<out>/variables`` subtree in exactly the layout
``cli.inference_gan.load_model`` restores, so

    python -m speech_enhancement_tpu.cli.convert_checkpoint \
        model_best.pth.tar converted_ckpt
    python -m speech_enhancement_tpu.cli.inference_gan \
        --cfg ... -m converted_ckpt -o enhanced

serves a reference-trained model on TPU unchanged.  Only inference
variables are converted — optimizer state is framework-specific, so a
converted checkpoint seeds evaluation or fine-tuning from epoch 0, not a
bit-exact ``--resume`` of the torch run.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def _verify_against_template(converted: dict, n_fft: int, hop: int,
                             crop_len: int) -> dict:
    """Shape-check the converted trees against a freshly-built
    GanTrainState — under ``jax.eval_shape`` so nothing compiles or
    executes (free even over a TPU tunnel) — and cast any leaf whose
    dtype differs (e.g. a float64/bf16 torch fine-tune) to the
    template's, so the written checkpoint always restores against the
    fp32 inference template."""
    import jax
    import numpy as np
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
        tmpl_flat = jax.tree_util.tree_flatten_with_path(template[name])[0]
        conv_flat = jax.tree_util.tree_flatten_with_path(converted[name])[0]
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

        converted[name] = jax.tree_util.tree_map(
            _cast, converted[name], template[name]
        )
    return converted


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
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_option(argv)

    import orbax.checkpoint as ocp

    from speech_enhancement_tpu.utils.convert_torch import convert_checkpoint

    converted = convert_checkpoint(args.checkpoint)
    if "gen" not in converted:
        raise SystemExit(
            f"{args.checkpoint} has no gen_state_dict — not a reference "
            "GAN checkpoint (main_gan.py:300-310 layout)"
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
