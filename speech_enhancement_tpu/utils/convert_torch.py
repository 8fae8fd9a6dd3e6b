"""Convert reference PyTorch checkpoints to this framework's variables.

Maps the reference TSCNet / Discriminator state_dicts
(main_gan.py checkpoint keys 'gen_state_dict' / 'disc_state_dict', with
the DDP 'module.' prefix stripped like inference_gan.py:64-69) onto the
flax param trees, so users of the reference can serve their trained
models here directly.

Layout conversions:
  torch Linear  [out, in]        -> flax kernel [in, out]
  torch Conv2d  [out, in, kh, kw]-> flax kernel [kh, kw, in, out]
  torch Conv1d  [out, in, k]     -> flax kernel [k, in, out]
  torch depthwise Conv1d [C,1,k] -> flax kernel [k, 1, C]
  InstanceNorm/LayerNorm weight/bias -> scale/bias
  BatchNorm1d -> params scale/bias + batch_stats mean/var
  spectral_norm weight_orig/_u   -> kernel + 'spectral' u
  4x TSCB blocks                 -> tscb_stack params stacked on axis 0
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def strip_module_prefix(state_dict: Mapping[str, Any]) -> dict:
    """Remove the DDP 'module.' prefix (inference_gan.py:64-69)."""
    out = {}
    for k, v in state_dict.items():
        out[k[7:] if k.startswith("module.") else k] = v
    return out


def _linear(sd, prefix):
    p = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def _conv2d(sd, prefix):
    p = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def _conv1d(sd, prefix):
    p = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def _norm_affine(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _prelu(sd, prefix):
    return {"alpha": _t(sd[f"{prefix}.weight"])}


def _dense_block(sd, prefix):
    out = {}
    for i in range(1, 5):
        out[f"conv{i}"] = _conv2d(sd, f"{prefix}.conv{i}")
        out[f"norm{i}"] = _norm_affine(sd, f"{prefix}.norm{i}")
        out[f"prelu{i}"] = _prelu(sd, f"{prefix}.prelu{i}")
    return out


def _dense_encoder(sd, prefix):
    return {
        "conv1": _conv2d(sd, f"{prefix}.conv_1.0"),
        "norm1": _norm_affine(sd, f"{prefix}.conv_1.1"),
        "prelu1": _prelu(sd, f"{prefix}.conv_1.2"),
        "dense": _dense_block(sd, f"{prefix}.dilated_dense"),
        "conv2": _conv2d(sd, f"{prefix}.conv_2.0"),
        "norm2": _norm_affine(sd, f"{prefix}.conv_2.1"),
        "prelu2": _prelu(sd, f"{prefix}.conv_2.2"),
    }


def _feed_forward(sd, prefix):
    # reference: Scale(0.5, PreNorm(dim, FeedForward)) — norm at .fn.norm,
    # linears at .fn.fn.net.{0,3} (conformer.py:195-202)
    return {
        "LayerNorm_0": _norm_affine(sd, f"{prefix}.fn.norm"),
        "Dense_0": _linear(sd, f"{prefix}.fn.fn.net.0"),
        "Dense_1": _linear(sd, f"{prefix}.fn.fn.net.3"),
    }


def _attention(sd, prefix):
    # PreNorm(dim, Attention): norm at .norm, attention at .fn
    return {
        "LayerNorm_0": _norm_affine(sd, f"{prefix}.norm"),
        "to_q": _linear(sd, f"{prefix}.fn.to_q"),
        "to_kv": _linear(sd, f"{prefix}.fn.to_kv"),
        "to_out": _linear(sd, f"{prefix}.fn.to_out"),
        "rel_pos_emb": _t(sd[f"{prefix}.fn.rel_pos_emb.weight"]),
    }


def _conv_module(sd, prefix):
    # net: 0 LayerNorm, 2 pointwise Conv1d, 4 DepthWiseConv1d(.conv),
    # 5 BatchNorm1d, 7 pointwise Conv1d (conformer.py:161-172)
    params = {
        "LayerNorm_0": _norm_affine(sd, f"{prefix}.net.0"),
        "Conv_0": _conv1d(sd, f"{prefix}.net.2"),
        "Conv_1": _conv1d(sd, f"{prefix}.net.4.conv"),
        "BatchNorm_0": _norm_affine(sd, f"{prefix}.net.5"),
        "Conv_2": _conv1d(sd, f"{prefix}.net.7"),
    }
    stats = {
        "BatchNorm_0": {
            "mean": _t(sd[f"{prefix}.net.5.running_mean"]),
            "var": _t(sd[f"{prefix}.net.5.running_var"]),
        }
    }
    return params, stats


def _conformer(sd, prefix):
    conv_p, conv_s = _conv_module(sd, f"{prefix}.conv")
    params = {
        "ff1": _feed_forward(sd, f"{prefix}.ff1"),
        "attn": {
            **_attention(sd, f"{prefix}.attn"),
        },
        "conv": conv_p,
        "ff2": _feed_forward(sd, f"{prefix}.ff2"),
        "LayerNorm_0": _norm_affine(sd, f"{prefix}.post_norm"),
    }
    return params, {"conv": conv_s}


def _tscb(sd, prefix):
    tp, ts = _conformer(sd, f"{prefix}.time_conformer")
    fp, fs = _conformer(sd, f"{prefix}.freq_conformer")
    return (
        {"time_conformer": tp, "freq_conformer": fp},
        {"time_conformer": ts, "freq_conformer": fs},
    )


def _stack_trees(trees: list) -> Any:
    """Stack identical pytrees along a new leading axis (the scanned
    tscb_stack layout)."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def _mask_decoder(sd, prefix, ):
    return {
        "dense": _dense_block(sd, f"{prefix}.dense_block"),
        "sub_pixel": {"conv": _conv2d(sd, f"{prefix}.sub_pixel.conv")},
        "conv1": _conv2d(sd, f"{prefix}.conv_1"),
        "norm": _norm_affine(sd, f"{prefix}.norm"),
        "prelu": _prelu(sd, f"{prefix}.prelu"),
        "final_conv": _conv2d(sd, f"{prefix}.final_conv"),
        "prelu_out": _prelu(sd, f"{prefix}.prelu_out"),
    }


def _complex_decoder(sd, prefix):
    return {
        "dense": _dense_block(sd, f"{prefix}.dense_block"),
        "sub_pixel": {"conv": _conv2d(sd, f"{prefix}.sub_pixel.conv")},
        "norm": _norm_affine(sd, f"{prefix}.norm"),
        "prelu": _prelu(sd, f"{prefix}.prelu"),
        "conv": _conv2d(sd, f"{prefix}.conv"),
    }


def convert_tscnet(state_dict: Mapping[str, Any]) -> dict:
    """Reference TSCNet gen_state_dict -> flax variables
    {'params', 'batch_stats'}."""
    sd = strip_module_prefix(state_dict)
    blocks = [_tscb(sd, f"TSCB_{k}") for k in range(1, 5)]
    stack_params = _stack_trees([{"block": b[0]} for b in blocks])
    stack_stats = _stack_trees([{"block": b[1]} for b in blocks])
    params = {
        "dense_encoder": _dense_encoder(sd, "dense_encoder"),
        "tscb_stack": stack_params,
        "mask_decoder": _mask_decoder(sd, "mask_decoder"),
        "complex_decoder": _complex_decoder(sd, "complex_decoder"),
    }
    return {"params": params, "batch_stats": {"tscb_stack": stack_stats}}


def convert_discriminator(state_dict: Mapping[str, Any]) -> dict:
    """Reference Discriminator disc_state_dict -> flax variables
    {'params', 'spectral'}."""
    sd = strip_module_prefix(state_dict)
    params: dict = {}
    spectral: dict = {}
    # layers: 0,3,6,9 SN-conv; 1,4,7,10 InstanceNorm; 2,5,8,11 PReLU;
    # 14 SN-linear; 16 PReLU; 17 SN-linear; 18 LearnableSigmoid
    conv_ids = [0, 3, 6, 9]
    for i, lid in enumerate(conv_ids, start=1):
        w = _t(sd[f"layers.{lid}.weight_orig"])  # [out, in, kh, kw]
        params[f"conv{i}"] = {"kernel": w.transpose(2, 3, 1, 0)}
        # torch's v lives in the (in, kh, kw) flattening; ours in (kh, kw, in)
        out_c, in_c, kh, kw = w.shape
        v = _t(sd[f"layers.{lid}.weight_v"]).reshape(in_c, kh, kw)
        spectral[f"conv{i}"] = {
            "u": _t(sd[f"layers.{lid}.weight_u"]),
            "v": v.transpose(1, 2, 0).ravel(),
        }
        params[f"norm{i}"] = _norm_affine(sd, f"layers.{lid + 1}")
        params[f"prelu{i}"] = _prelu(sd, f"layers.{lid + 2}")
    params["fc1"] = {
        "kernel": _t(sd["layers.14.weight_orig"]).T,
        "bias": _t(sd["layers.14.bias"]),
    }
    spectral["fc1"] = {
        "u": _t(sd["layers.14.weight_u"]),
        "v": _t(sd["layers.14.weight_v"]),
    }
    params["prelu_fc"] = _prelu(sd, "layers.16")
    params["fc2"] = {
        "kernel": _t(sd["layers.17.weight_orig"]).T,
        "bias": _t(sd["layers.17.bias"]),
    }
    spectral["fc2"] = {
        "u": _t(sd["layers.17.weight_u"]),
        "v": _t(sd["layers.17.weight_v"]),
    }
    params["sigmoid"] = {"slope": _t(sd["layers.18.slope"])}
    return {"params": params, "spectral": spectral}


def _diffusion_embedding(sd, prefix):
    # two SiLU Linears over the (non-persistent, rebuilt) sin/cos table
    # (reference models/DiffuSE.py:39-69)
    return {
        "projection1": _linear(sd, f"{prefix}.projection1"),
        "projection2": _linear(sd, f"{prefix}.projection2"),
    }


def _upsampler(sd, prefix):
    """torch ConvTranspose2d [in=1, out=1, kh=3, kw=2L] over (freq, time)
    -> flax conv_transpose kernel (2L, 3, 1, 1) over (time, freq):
    transpose the spatial dims THEN flip both (lax.conv_transpose does
    not mirror the kernel the way torch's fractionally-strided conv
    does; mapping pinned numerically at rel 9e-8, the three other
    flip combinations are 0.86-1.29 off)."""
    out = {}
    for name in ("conv1", "conv2"):
        w = _t(sd[f"{prefix}.{name}.weight"])[0, 0]  # [kh=3, kw=2L]
        out[name] = np.flip(w.T, (0, 1))[:, :, None, None].copy()
        out[f"{name}_bias"] = _t(sd[f"{prefix}.{name}.bias"])
    return out


def _residual_block(sd, prefix, use_groupnorm):
    """Gated residual block (DiffuSE.py:90-121).  The author's variant
    wraps dilated_conv/output_projection in Sequential(conv, GroupNorm)
    (keys '.0'/'.1'); the vendored cdiffuse one (cdiffuse/model.py:86-112)
    is bare convs."""
    if use_groupnorm:
        p = {
            "dilated_conv": _conv1d(sd, f"{prefix}.dilated_conv.0"),
            "dilated_norm": _norm_affine(sd, f"{prefix}.dilated_conv.1"),
            "output_projection": _conv1d(sd, f"{prefix}.output_projection.0"),
            "output_norm": _norm_affine(sd, f"{prefix}.output_projection.1"),
        }
    else:
        p = {
            "dilated_conv": _conv1d(sd, f"{prefix}.dilated_conv"),
            "output_projection": _conv1d(sd, f"{prefix}.output_projection"),
        }
    p["diffusion_projection"] = _linear(sd, f"{prefix}.diffusion_projection")
    p["conditioner_projection"] = _conv1d(sd, f"{prefix}.conditioner_projection")
    p["output_residual"] = _conv1d(sd, f"{prefix}.output_residual")
    return p


def convert_diffuse(state_dict: Mapping[str, Any],
                    use_groupnorm: bool = True) -> dict:
    """Reference DiffuSE waveform-model state_dict -> flax variables
    {'params'}.  ``use_groupnorm=True`` for main_diffuse 'diffuse'
    checkpoints (models/DiffuSE.py), False for standalone cdiffuse
    ``weights.pt`` model dicts (cdiffuse/model.py)."""
    sd = strip_module_prefix(state_dict)
    n = 0
    while f"residual_layers.{n}.diffusion_projection.weight" in sd:
        n += 1
    if n == 0:
        raise ValueError("no residual_layers.* keys — not a DiffuSE "
                         "state_dict")
    params = {
        "input_projection": _conv1d(sd, "input_projection"),
        "diffusion_embedding": _diffusion_embedding(sd, "diffusion_embedding"),
        "spectrogram_upsampler": _upsampler(sd, "spectrogram_upsampler"),
        "skip_projection": _conv1d(sd, "skip_projection"),
        "output_projection": _conv1d(sd, "output_projection"),
    }
    for i in range(n):
        params[f"residual{i}"] = _residual_block(
            sd, f"residual_layers.{i}", use_groupnorm
        )
    return {"params": params}


def convert_tsc_diffusion(state_dict: Mapping[str, Any]) -> dict:
    """Reference diffusion TSCNet state_dict (models/tsc_diffusion.py:43-91,
    saved by main_diffuse.py:329-336) -> flax variables
    {'params', 'batch_stats'}.  The reference shares ONE MergeBlock
    instance across the four TSCBs, so there is exactly one merge_block
    subtree on both sides."""
    sd = strip_module_prefix(state_dict)
    params = {
        "dense_encoder": _dense_encoder(sd, "dense_encoder"),
        "dense_encoder_noisy": _dense_encoder(sd, "dense_encoder_noisy"),
        "merge_block": {
            "diffusion_embedding": _diffusion_embedding(
                sd, "merge_block.diffusion_embedding"
            ),
            "diffusion_projection": _linear(sd, "merge_block.diffusion_projection"),
            "merge_diffusion": _conv2d(sd, "merge_block.merge_diffusion"),
            "conditioner_projection": _conv2d(
                sd, "merge_block.conditioner_projection"
            ),
            "output_residual": _conv2d(sd, "merge_block.output_residual"),
        },
        "mask_decoder": _mask_decoder(sd, "mask_decoder"),
        "complex_decoder": _complex_decoder(sd, "complex_decoder"),
    }
    stats = {}
    for i in range(1, 5):
        p, s = _tscb(sd, f"TSCB_{i}")
        params[f"tscb{i}"] = p
        stats[f"tscb{i}"] = s
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Reverse direction: flax variables -> reference torch state_dicts, so a
# TPU-trained model can be loaded and verified inside the reference stack
# (inference_gan.py:60-72).  Each _inv_* is the exact inverse of the
# corresponding forward helper above; round-trip validated by
# tests/test_torch_parity.py::test_roundtrip_export.
# ---------------------------------------------------------------------------


def _inv_linear(p, sd, prefix):
    sd[f"{prefix}.weight"] = _t(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _inv_conv2d(p, sd, prefix):
    sd[f"{prefix}.weight"] = _t(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _inv_conv1d(p, sd, prefix):
    sd[f"{prefix}.weight"] = _t(p["kernel"]).transpose(2, 1, 0)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _inv_norm_affine(p, sd, prefix):
    sd[f"{prefix}.weight"] = _t(p["scale"])
    sd[f"{prefix}.bias"] = _t(p["bias"])


def _inv_prelu(p, sd, prefix):
    sd[f"{prefix}.weight"] = _t(p["alpha"])


def _inv_dense_block(p, sd, prefix):
    for i in range(1, 5):
        _inv_conv2d(p[f"conv{i}"], sd, f"{prefix}.conv{i}")
        _inv_norm_affine(p[f"norm{i}"], sd, f"{prefix}.norm{i}")
        _inv_prelu(p[f"prelu{i}"], sd, f"{prefix}.prelu{i}")


def _inv_dense_encoder(p, sd, prefix):
    _inv_conv2d(p["conv1"], sd, f"{prefix}.conv_1.0")
    _inv_norm_affine(p["norm1"], sd, f"{prefix}.conv_1.1")
    _inv_prelu(p["prelu1"], sd, f"{prefix}.conv_1.2")
    _inv_dense_block(p["dense"], sd, f"{prefix}.dilated_dense")
    _inv_conv2d(p["conv2"], sd, f"{prefix}.conv_2.0")
    _inv_norm_affine(p["norm2"], sd, f"{prefix}.conv_2.1")
    _inv_prelu(p["prelu2"], sd, f"{prefix}.conv_2.2")


def _inv_feed_forward(p, sd, prefix):
    _inv_norm_affine(p["LayerNorm_0"], sd, f"{prefix}.fn.norm")
    _inv_linear(p["Dense_0"], sd, f"{prefix}.fn.fn.net.0")
    _inv_linear(p["Dense_1"], sd, f"{prefix}.fn.fn.net.3")


def _inv_attention(p, sd, prefix):
    _inv_norm_affine(p["LayerNorm_0"], sd, f"{prefix}.norm")
    _inv_linear(p["to_q"], sd, f"{prefix}.fn.to_q")
    _inv_linear(p["to_kv"], sd, f"{prefix}.fn.to_kv")
    _inv_linear(p["to_out"], sd, f"{prefix}.fn.to_out")
    sd[f"{prefix}.fn.rel_pos_emb.weight"] = _t(p["rel_pos_emb"])


def _inv_conv_module(p, s, sd, prefix):
    _inv_norm_affine(p["LayerNorm_0"], sd, f"{prefix}.net.0")
    _inv_conv1d(p["Conv_0"], sd, f"{prefix}.net.2")
    _inv_conv1d(p["Conv_1"], sd, f"{prefix}.net.4.conv")
    _inv_norm_affine(p["BatchNorm_0"], sd, f"{prefix}.net.5")
    sd[f"{prefix}.net.5.running_mean"] = _t(s["BatchNorm_0"]["mean"])
    sd[f"{prefix}.net.5.running_var"] = _t(s["BatchNorm_0"]["var"])
    # torch BatchNorm1d state_dicts carry this bookkeeping int64 scalar;
    # strict load_state_dict refuses the dict without it
    sd[f"{prefix}.net.5.num_batches_tracked"] = np.zeros((), np.int64)
    _inv_conv1d(p["Conv_2"], sd, f"{prefix}.net.7")


def _inv_conformer(p, s, sd, prefix):
    _inv_feed_forward(p["ff1"], sd, f"{prefix}.ff1")
    _inv_attention(p["attn"], sd, f"{prefix}.attn")
    _inv_conv_module(p["conv"], s["conv"], sd, f"{prefix}.conv")
    _inv_feed_forward(p["ff2"], sd, f"{prefix}.ff2")
    _inv_norm_affine(p["LayerNorm_0"], sd, f"{prefix}.post_norm")


def _inv_mask_decoder(p, sd, prefix):
    _inv_dense_block(p["dense"], sd, f"{prefix}.dense_block")
    _inv_conv2d(p["sub_pixel"]["conv"], sd, f"{prefix}.sub_pixel.conv")
    _inv_conv2d(p["conv1"], sd, f"{prefix}.conv_1")
    _inv_norm_affine(p["norm"], sd, f"{prefix}.norm")
    _inv_prelu(p["prelu"], sd, f"{prefix}.prelu")
    _inv_conv2d(p["final_conv"], sd, f"{prefix}.final_conv")
    _inv_prelu(p["prelu_out"], sd, f"{prefix}.prelu_out")


def _inv_complex_decoder(p, sd, prefix):
    _inv_dense_block(p["dense"], sd, f"{prefix}.dense_block")
    _inv_conv2d(p["sub_pixel"]["conv"], sd, f"{prefix}.sub_pixel.conv")
    _inv_norm_affine(p["norm"], sd, f"{prefix}.norm")
    _inv_prelu(p["prelu"], sd, f"{prefix}.prelu")
    _inv_conv2d(p["conv"], sd, f"{prefix}.conv")


def export_tscnet(variables: Mapping[str, Any]) -> dict:
    """Flax TSCNet variables {'params','batch_stats'} -> reference torch
    gen_state_dict (models/generator.py layout, no DDP prefix)."""
    import jax

    params = variables["params"]
    stats = variables["batch_stats"]
    sd: dict = {}
    _inv_dense_encoder(params["dense_encoder"], sd, "dense_encoder")
    # unstack the scanned tscb_stack back into TSCB_1..4
    stack_p = jax.tree_util.tree_map(np.asarray, params["tscb_stack"])
    stack_s = jax.tree_util.tree_map(np.asarray, stats["tscb_stack"])
    for k in range(4):
        blk_p = jax.tree_util.tree_map(lambda x, _k=k: x[_k], stack_p)["block"]
        blk_s = jax.tree_util.tree_map(lambda x, _k=k: x[_k], stack_s)["block"]
        for axis in ("time_conformer", "freq_conformer"):
            _inv_conformer(blk_p[axis], blk_s[axis], sd,
                           f"TSCB_{k + 1}.{axis}")
    _inv_mask_decoder(params["mask_decoder"], sd, "mask_decoder")
    _inv_complex_decoder(params["complex_decoder"], sd, "complex_decoder")
    return sd


def export_discriminator(variables: Mapping[str, Any]) -> dict:
    """Flax Discriminator variables {'params','spectral'} -> reference
    torch disc_state_dict (spectral-norm weight_orig/_u/_v layout)."""
    params = variables["params"]
    spectral = variables["spectral"]
    sd: dict = {}
    conv_ids = [0, 3, 6, 9]
    for i, lid in enumerate(conv_ids, start=1):
        k = _t(params[f"conv{i}"]["kernel"])  # [kh, kw, in, out]
        sd[f"layers.{lid}.weight_orig"] = k.transpose(3, 2, 0, 1)
        kh, kw, in_c, _ = k.shape
        v = _t(spectral[f"conv{i}"]["v"]).reshape(kh, kw, in_c)
        sd[f"layers.{lid}.weight_v"] = v.transpose(2, 0, 1).ravel()
        sd[f"layers.{lid}.weight_u"] = _t(spectral[f"conv{i}"]["u"])
        _inv_norm_affine(params[f"norm{i}"], sd, f"layers.{lid + 1}")
        _inv_prelu(params[f"prelu{i}"], sd, f"layers.{lid + 2}")
    sd["layers.14.weight_orig"] = _t(params["fc1"]["kernel"]).T
    sd["layers.14.bias"] = _t(params["fc1"]["bias"])
    sd["layers.14.weight_u"] = _t(spectral["fc1"]["u"])
    sd["layers.14.weight_v"] = _t(spectral["fc1"]["v"])
    _inv_prelu(params["prelu_fc"], sd, "layers.16")
    sd["layers.17.weight_orig"] = _t(params["fc2"]["kernel"]).T
    sd["layers.17.bias"] = _t(params["fc2"]["bias"])
    sd["layers.17.weight_u"] = _t(spectral["fc2"]["u"])
    sd["layers.17.weight_v"] = _t(spectral["fc2"]["v"])
    sd["layers.18.slope"] = _t(params["sigmoid"]["slope"])
    return sd


def export_checkpoint(gen_variables: Mapping[str, Any],
                      disc_variables: Mapping[str, Any] | None,
                      path: str, epoch: int = 0, arch: str = "scp") -> None:
    """Write a reference-layout ``.pth.tar`` (main_gan.py:300-310 keys,
    DDP ``module.`` prefixes included so the reference
    ``inference_gan.load_model``'s unconditional prefix strip works)."""
    import torch

    ckpt = {
        "epoch": epoch,
        "arch": arch,
        "gen_state_dict": {
            f"module.{k}": torch.from_numpy(np.ascontiguousarray(v))
            for k, v in export_tscnet(gen_variables).items()
        },
    }
    if disc_variables is not None:
        ckpt["disc_state_dict"] = {
            f"module.{k}": torch.from_numpy(np.ascontiguousarray(v))
            for k, v in export_discriminator(disc_variables).items()
        }
    torch.save(ckpt, path)


def convert_checkpoint(path: str) -> dict:
    """Load a reference torch checkpoint file and convert every model in
    it.  Detects the three reference formats:

    - GAN (main_gan.py:300-310): {'gen_state_dict', 'disc_state_dict'}
      -> {'gen': variables, 'disc': variables}
    - diffusion trainer (main_diffuse.py:329-336): {'arch', 'state_dict'}
      -> {'arch': str, 'model': variables}
    - standalone cdiffuse weights.pt (cdiffuse/learner.py:60-72):
      {'step', 'model', ...} -> {'arch': 'cdiffuse', 'model': variables}
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def _np(v):
        # torch bfloat16 has no numpy dtype: Tensor.numpy() raises
        # TypeError, so a bf16 fine-tuned reference checkpoint would crash
        # here before the template-dtype cast ever ran.  Upcast ONLY bf16
        # (float() on int tensors like BN num_batches_tracked would
        # corrupt them).
        return (v.float() if v.dtype == torch.bfloat16 else v).numpy()

    def _sd(d):
        return {k: _np(v) for k, v in d.items()}

    out = {}
    if "gen_state_dict" in ckpt:
        out["gen"] = convert_tscnet(_sd(ckpt["gen_state_dict"]))
    if "disc_state_dict" in ckpt:
        out["disc"] = convert_discriminator(_sd(ckpt["disc_state_dict"]))
    if out:
        return out
    if "state_dict" in ckpt:  # main_diffuse family
        arch = str(ckpt.get("arch", ""))
        sd = _sd(ckpt["state_dict"])
        # the STRUCTURE decides the branch — a mislabeled 'arch' tag on
        # the wrong tree would otherwise crash deep inside the mapper
        # (or write a checkpoint whose printed serve command fails)
        is_tsc = "merge_block.merge_diffusion.weight" in strip_module_prefix(sd)
        if arch and arch.startswith("tsc") != is_tsc:
            structural = "tsc-diffuse" if is_tsc else "diffuse"
            print(f"WARNING: checkpoint says arch='{arch}' but the "
                  f"state_dict is structurally {structural} "
                  f"({'has' if is_tsc else 'lacks'} merge_block keys) — "
                  f"converting as {structural}")
            arch = structural
        if is_tsc:
            return {"arch": arch or "tsc-diffuse",
                    "model": convert_tsc_diffusion(sd)}
        return {"arch": arch or "diffuse",
                "model": convert_diffuse(sd, use_groupnorm=True)}
    if "model" in ckpt and "step" in ckpt:  # cdiffuse weights.pt
        out = {"arch": "cdiffuse",
               "model": convert_diffuse(_sd(ckpt["model"]),
                                        use_groupnorm=False)}
        # the learner saves its AttrDict params alongside the weights
        # (cdiffuse/learner.py:60-72) — dilation_cycle_length and the
        # noise schedules are NOT recoverable from weight shapes, so a
        # non-default upstream run (params.override) would silently serve
        # with wrong dilations/schedule if these were dropped
        saved = ckpt.get("params") or {}
        keep = {}
        for k in ("dilation_cycle_length", "noise_schedule",
                  "inference_noise_schedule"):
            if k in saved:
                v = saved[k]
                keep[k] = (np.asarray(v).tolist()
                           if isinstance(v, (list, tuple, np.ndarray))
                           else (v.item() if isinstance(v, np.generic)
                                 else v))
        if keep:
            out["params"] = keep
        return out
    raise ValueError(
        f"{path}: unrecognized checkpoint layout (keys {sorted(ckpt)[:8]}) — "
        "expected a reference GAN .pth.tar, a main_diffuse .pth.tar, or a "
        "cdiffuse weights.pt"
    )
