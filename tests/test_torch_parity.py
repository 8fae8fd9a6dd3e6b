"""Full-model output parity against the reference PyTorch implementation
via the checkpoint converter.

These tests instantiate the actual reference models (torch, CPU), convert
their randomly-initialized state_dicts with utils.convert_torch, and
compare forward outputs — proving the two frameworks compute the same
function.  Skipped when the reference repo or torch is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = os.environ.get("SE_TPU_REFERENCE", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(REFERENCE):
    pytest.skip("reference repo not mounted", allow_module_level=True)


@pytest.fixture(scope="module")
def ref_modules():
    for name in ("pesq", "joblib"):
        mod = types.ModuleType(name)
        mod.pesq = lambda *a, **k: 3.0
        mod.Parallel = mod.delayed = None
        sys.modules.setdefault(name, mod)
    sys.path.insert(0, REFERENCE)
    try:
        from models.discriminator import Discriminator as TorchDisc
        from models.generator import TSCNet as TorchTSCNet
    finally:
        sys.path.pop(0)
    return TorchTSCNet, TorchDisc


def test_generator_parity(ref_modules):
    import jax
    import jax.numpy as jnp

    from speech_enhancement_tpu.models import TSCNet
    from speech_enhancement_tpu.ops import compressed_stft
    from speech_enhancement_tpu.utils.convert_torch import convert_tscnet

    TorchTSCNet, _ = ref_modules
    torch.manual_seed(0)
    tm = TorchTSCNet(num_channel=64, num_features=201).eval()
    variables = convert_tscnet({k: v.numpy() for k, v in tm.state_dict().items()})

    rng = np.random.default_rng(0)
    x = 0.1 * rng.standard_normal((2, 16000)).astype(np.float32)
    w = torch.hamming_window(400)
    spec_t = torch.stft(torch.tensor(x), 400, 100, window=w, onesided=True,
                        return_complex=True)
    comp = torch.polar(spec_t.abs() ** 0.3, spec_t.angle())
    with torch.no_grad():
        est_r, est_i = tm(comp)
    est_r = est_r.squeeze(1).numpy()
    est_i = est_i.squeeze(1).numpy()

    spec_j = compressed_stft(jnp.asarray(x), 400, 100, comp_type="pow")
    model = TSCNet(num_channel=64, num_features=201)
    jr, ji = model.apply(variables, spec_j, deterministic=True)

    rel_r = np.sqrt(np.mean((est_r - np.asarray(jr)) ** 2) / np.mean(est_r**2))
    rel_i = np.sqrt(np.mean((est_i - np.asarray(ji)) ** 2) / np.mean(est_i**2))
    assert rel_r < 1e-4, rel_r
    assert rel_i < 1e-4, rel_i


def test_convert_checkpoint_cli(ref_modules, tmp_path):
    """Migration path: a reference-layout .pth.tar (main_gan.py:300-310,
    DDP 'module.' prefixes included) converts to an orbax checkpoint dir
    whose variables round-trip bit-exactly."""
    from speech_enhancement_tpu.cli import convert_checkpoint as cc
    from speech_enhancement_tpu.utils.checkpoint import load_variables
    from speech_enhancement_tpu.utils.convert_torch import convert_checkpoint

    TorchTSCNet, TorchDisc = ref_modules
    torch.manual_seed(2)
    tm = TorchTSCNet(num_channel=64, num_features=201)
    td = TorchDisc(ndf=16)
    ckpt = tmp_path / "model_best.pth.tar"
    torch.save(
        {
            "epoch": 5,
            "arch": "scp",
            "gen_state_dict": {f"module.{k}": v
                               for k, v in tm.state_dict().items()},
            "disc_state_dict": {f"module.{k}": v
                                for k, v in td.state_dict().items()},
        },
        ckpt,
    )

    out = tmp_path / "converted"
    assert cc.main([str(ckpt), str(out)]) == 0
    assert (out / "variables").is_dir()

    expected = convert_checkpoint(str(ckpt))
    restored = load_variables(str(out), expected)
    import jax

    mismatches = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        restored, expected,
    )
    assert max(jax.tree_util.tree_leaves(mismatches)) == 0.0

    # refuses to clobber an existing conversion
    with pytest.raises(SystemExit):
        cc.main([str(ckpt), str(out)])

    # non-fp32 torch leaves (e.g. a float64 fine-tune) are cast to the
    # template dtype during verification, so the written checkpoint
    # always restores against the fp32 inference template
    f64 = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64), expected
    )
    normalized = cc._verify_against_template(f64, 400, 100, 16000)
    dtypes = {
        np.asarray(leaf).dtype
        for leaf in jax.tree_util.tree_leaves(normalized)
    }
    assert dtypes == {np.dtype(np.float32)}


def test_convert_checkpoint_bf16(ref_modules, tmp_path):
    """A bf16 fine-tuned reference checkpoint must convert, not crash:
    torch bfloat16 has no numpy dtype, so an unguarded Tensor.numpy()
    raises TypeError before any dtype handling runs.  Values must match
    the fp32 conversion within bf16 quantization."""
    from speech_enhancement_tpu.utils.convert_torch import convert_checkpoint

    TorchTSCNet, _ = ref_modules
    torch.manual_seed(3)
    tm = TorchTSCNet(num_channel=64, num_features=201)
    sd = tm.state_dict()
    bf16_sd = {
        k: (v.bfloat16() if v.is_floating_point() else v)
        for k, v in sd.items()
    }
    ckpt = tmp_path / "bf16.pth.tar"
    torch.save({"gen_state_dict": bf16_sd}, ckpt)
    got = convert_checkpoint(str(ckpt))["gen"]

    torch.save({"gen_state_dict": sd}, ckpt)
    want = convert_checkpoint(str(ckpt))["gen"]
    import jax

    rel = jax.tree_util.tree_map(
        lambda a, b: float(
            np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max()
            / (np.abs(np.asarray(b, np.float64)).max() + 1e-12)
        ),
        got, want,
    )
    assert max(jax.tree_util.tree_leaves(rel)) < 1e-2  # bf16 mantissa


def test_discriminator_parity(ref_modules):
    import jax.numpy as jnp

    from speech_enhancement_tpu.models import Discriminator
    from speech_enhancement_tpu.utils.convert_torch import convert_discriminator

    _, TorchDisc = ref_modules
    torch.manual_seed(1)
    td = TorchDisc(ndf=16).eval()
    variables = convert_discriminator(
        {k: v.numpy() for k, v in td.state_dict().items()}
    )

    rng = np.random.default_rng(0)
    x = np.abs(rng.standard_normal((2, 161, 201))).astype(np.float32)
    y = (0.5 * x).astype(np.float32)
    with torch.no_grad():
        h = torch.cat([torch.tensor(x[:, None]), torch.tensor(y[:, None])], dim=1)
        for layer in list(td.layers)[:18]:  # up to pre-sigmoid
            h = layer(h)
        pre_t = h.numpy()

    model = Discriminator(ndf=16)
    _, state = model.apply(
        variables, jnp.asarray(x), jnp.asarray(y), deterministic=True,
        capture_intermediates=True, mutable=["intermediates"],
    )
    pre_j = np.asarray(state["intermediates"]["fc2"]["__call__"][0])
    np.testing.assert_allclose(pre_t, pre_j, rtol=1e-4, atol=1e-3)
