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


def convert_checkpoint(path: str) -> dict:
    """Load a reference torch checkpoint file and convert both models.
    Returns {'gen': variables, 'disc': variables}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def _np(v):
        # torch bfloat16 has no numpy dtype: Tensor.numpy() raises
        # TypeError, so a bf16 fine-tuned reference checkpoint would crash
        # here before the template-dtype cast ever ran.  Upcast ONLY bf16
        # (float() on int tensors like BN num_batches_tracked would
        # corrupt them).
        return (v.float() if v.dtype == torch.bfloat16 else v).numpy()

    out = {}
    if "gen_state_dict" in ckpt:
        out["gen"] = convert_tscnet(
            {k: _np(v) for k, v in ckpt["gen_state_dict"].items()}
        )
    if "disc_state_dict" in ckpt:
        out["disc"] = convert_discriminator(
            {k: _np(v) for k, v in ckpt["disc_state_dict"].items()}
        )
    return out
