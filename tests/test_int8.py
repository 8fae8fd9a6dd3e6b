"""int8 quantized convolution path (ops/int8.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.models import TSCNet
from speech_enhancement_tpu.ops import compressed_stft
from speech_enhancement_tpu.ops.int8 import int8_conv2d, quantize_symmetric


def _np_int8_conv(x, w, b, strides=(1, 1), dilation=(1, 1)):
    """Literal numpy reimplementation of the quantization + int32
    accumulation — int math is exact, so the JAX version must match it
    bit-for-bit (up to the final float rescale)."""
    sx = max(np.abs(x).max(), 1e-12) / 127.0
    xq = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
    sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
    wq = np.clip(np.round(w / sw), -127, 127).astype(np.int32)
    kh, kw, cin, cout = w.shape
    bsz, h, width, _ = x.shape
    dh, dw = dilation
    sh, sw_ = strides
    h_out = (h - (kh - 1) * dh - 1) // sh + 1
    w_out = (width - (kw - 1) * dw - 1) // sw_ + 1
    acc = np.zeros((bsz, h_out, w_out, cout), np.int64)
    for i in range(kh):
        for j in range(kw):
            sl = xq[:, i * dh : i * dh + (h_out - 1) * sh + 1 : sh,
                    j * dw : j * dw + (w_out - 1) * sw_ + 1 : sw_, :]
            acc += np.einsum("bhwc,co->bhwo", sl, wq[i, j])
    return acc * (sx * sw.reshape(1, 1, 1, cout)) + b


def test_quantize_symmetric_roundtrip(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32)
    q, s = quantize_symmetric(jnp.asarray(x))
    assert q.dtype == jnp.int8
    # dequantized error bounded by half a quantization step
    np.testing.assert_allclose(np.asarray(q, np.float32) * np.asarray(s), x,
                               atol=float(s) * 0.5 + 1e-7)
    assert int(np.abs(np.asarray(q)).max()) == 127  # full-scale use


def test_int8_conv_matches_numpy_reference(rng):
    for strides, dilation in [((1, 1), (1, 1)), ((1, 2), (1, 1)),
                              ((1, 1), (4, 1))]:
        x = rng.standard_normal((2, 12, 10, 16)).astype(np.float32)
        w = rng.standard_normal((2, 3, 16, 8)).astype(np.float32)
        b = rng.standard_normal(8).astype(np.float32)
        got = int8_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                          strides=strides, dilation=dilation)
        want = _np_int8_conv(x, w, b, strides=strides, dilation=dilation)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-5)


def test_int8_conv_close_to_float_conv(rng):
    x = rng.standard_normal((2, 12, 10, 32)).astype(np.float32)
    w = (0.1 * rng.standard_normal((2, 3, 32, 16))).astype(np.float32)
    got = np.asarray(int8_conv2d(jnp.asarray(x), jnp.asarray(w)))
    want = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ))
    rel = np.sqrt(np.mean((got - want) ** 2) / np.mean(want**2))
    assert rel < 0.02, rel  # ~8-bit quantization noise


def test_quantized_tscnet_matches_param_tree_and_output(rng):
    """quantized_convs=True must (a) keep the parameter tree identical to
    the float model — any checkpoint restores either way — and (b) stay
    close to the float output on a random-init small model."""
    x = jnp.asarray(0.1 * rng.standard_normal((1, 8000)).astype(np.float32))
    spec = compressed_stft(x, 400, 100)
    fm = TSCNet(num_channel=16, num_features=201)
    qm = TSCNet(num_channel=16, num_features=201, quantized_convs=True)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    fv = fm.init(rngs, spec, deterministic=True)
    qv = qm.init(rngs, spec, deterministic=True)
    assert jax.tree_util.tree_structure(fv) == jax.tree_util.tree_structure(qv)
    for a, b in zip(jax.tree_util.tree_leaves(fv),
                    jax.tree_util.tree_leaves(qv)):
        assert a.shape == b.shape and a.dtype == b.dtype

    fr, fi = fm.apply(fv, spec, deterministic=True)
    qr, qi = qm.apply(fv, spec, deterministic=True)  # float params, quant path
    err = np.sqrt(
        float(jnp.mean((fr - qr) ** 2 + (fi - qi) ** 2))
        / float(jnp.mean(fr**2 + fi**2))
    )
    assert err < 0.25, err  # random-init bound; real-quality gate is PESQ
