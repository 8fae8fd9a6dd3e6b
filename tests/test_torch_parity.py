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


@pytest.fixture(scope="module")
def ref_diffusion_modules(ref_modules):
    """Reference diffusion models (import AFTER ref_modules so the pesq/
    joblib stubs and sys.path shim are in place)."""
    sys.path.insert(0, REFERENCE)
    try:
        from cdiffuse.model import DiffuSE as CdiffuseTorch
        from models.DiffuSE import DiffuSE as TorchDiffuSE
        from models.tsc_diffusion import TSCNet as TorchTSCDiffusion
    finally:
        sys.path.pop(0)
    return TorchDiffuSE, TorchTSCDiffusion, CdiffuseTorch


SCHED = np.linspace(1e-4, 0.035, 50)


def _randomize_output_conv(tm):
    """The reference zero-inits output_projection.weight
    (models/DiffuSE.py:143) which makes the forward output CONSTANT
    (bias-only) on a fresh model — any upstream conversion error would
    be invisible.  Randomize it so parity is meaningful."""
    with torch.no_grad():
        tm.output_projection.weight.normal_()


def test_diffuse_parity(ref_diffusion_modules):
    """Waveform DiffuSE (GroupNorm variant, main_diffuse 'diffuse' arch):
    converted weights reproduce the torch forward for integer AND
    fractional (fast-sampling) timesteps."""
    import jax.numpy as jnp

    from speech_enhancement_tpu.models import DiffuSE
    from speech_enhancement_tpu.utils.convert_torch import convert_diffuse

    TorchDiffuSE, _, _ = ref_diffusion_modules
    torch.manual_seed(0)
    tm = TorchDiffuSE(
        dilation_cycle_length=10, hop_length=100, n_specs=201,
        noise_schedule=SCHED, residual_channels=32, residual_layers=6,
    ).eval()
    _randomize_output_conv(tm)
    variables = convert_diffuse(
        {k: v.numpy() for k, v in tm.state_dict().items()}
    )

    rng = np.random.default_rng(0)
    audio = 0.1 * rng.standard_normal((2, 8000)).astype(np.float32)
    spec = rng.standard_normal((2, 201, 80)).astype(np.float32)  # [B,F,T]
    t = np.array([3, 17])
    with torch.no_grad():
        yt = tm(torch.tensor(audio), torch.tensor(spec),
                torch.tensor(t)).numpy()[:, 0]
    jm = DiffuSE(residual_channels=32, residual_layers=6, num_steps=50)
    yj = np.asarray(jm.apply(variables, jnp.asarray(audio),
                             jnp.asarray(spec.transpose(0, 2, 1)),
                             jnp.asarray(t)))
    rel = np.sqrt(np.mean((yt - yj) ** 2) / np.mean(yt**2))
    assert rel < 1e-5, rel

    # fractional t — the reference lerp path only broadcasts a 0-dim t
    # (DiffuSE.py:57-62); ours takes a batch, so feed the same value
    with torch.no_grad():
        yt2 = tm(torch.tensor(audio), torch.tensor(spec),
                 torch.tensor(np.float32(3.4))).numpy()[:, 0]
    yj2 = np.asarray(jm.apply(variables, jnp.asarray(audio),
                              jnp.asarray(spec.transpose(0, 2, 1)),
                              jnp.asarray(np.array([3.4, 3.4], np.float32))))
    rel2 = np.sqrt(np.mean((yt2 - yj2) ** 2) / np.mean(yt2**2))
    assert rel2 < 1e-5, rel2


def test_cdiffuse_parity(ref_diffusion_modules):
    """Vendored cdiffuse DiffuSE (no GroupNorm, 16x upsampler stride —
    cdiffuse/model.py): weights.pt 'model' dicts convert with
    use_groupnorm=False."""
    import jax.numpy as jnp

    from speech_enhancement_tpu.models import DiffuSE
    from speech_enhancement_tpu.utils.convert_torch import convert_diffuse

    _, _, CdiffuseTorch = ref_diffusion_modules

    class P(dict):
        __getattr__ = dict.__getitem__

    p = P(dilation_cycle_length=10, residual_channels=32,
          residual_layers=6, noise_schedule=SCHED, n_mels=201)
    torch.manual_seed(1)
    cm = CdiffuseTorch(None, p).eval()
    _randomize_output_conv(cm)
    cvars = convert_diffuse(
        {k: v.numpy() for k, v in cm.state_dict().items()},
        use_groupnorm=False,
    )
    rng = np.random.default_rng(1)
    spec = rng.standard_normal((2, 201, 20)).astype(np.float32)
    audio = 0.1 * rng.standard_normal((2, 20 * 256)).astype(np.float32)
    t = np.array([3, 17])
    with torch.no_grad():
        yt = cm(torch.tensor(audio), torch.tensor(spec),
                torch.tensor(t)).numpy()[:, 0]
    jm = DiffuSE(residual_channels=32, residual_layers=6, num_steps=50,
                 hop_length=256, use_groupnorm=False)
    yj = np.asarray(jm.apply(cvars, jnp.asarray(audio),
                             jnp.asarray(spec.transpose(0, 2, 1)),
                             jnp.asarray(t)))
    rel = np.sqrt(np.mean((yt - yj) ** 2) / np.mean(yt**2))
    assert rel < 1e-5, rel


def test_tsc_diffusion_parity(ref_diffusion_modules):
    """Spectrogram diffusion TSCNet (shared MergeBlock + 4 TSCBs,
    models/tsc_diffusion.py): full-size converted forward parity."""
    import jax.numpy as jnp

    from speech_enhancement_tpu.models import DiffusionTSCNet
    from speech_enhancement_tpu.utils.convert_torch import (
        convert_tsc_diffusion,
    )

    _, TorchTSCDiffusion, _ = ref_diffusion_modules
    torch.manual_seed(2)
    ts = TorchTSCDiffusion(num_channel=64, num_features=201,
                           noise_schedule=SCHED).eval()
    tvars = convert_tsc_diffusion(
        {k: v.numpy() for k, v in ts.state_dict().items()}
    )
    rng = np.random.default_rng(2)
    x = 0.1 * rng.standard_normal((2, 8000)).astype(np.float32)
    n = (x + 0.01 * rng.standard_normal(x.shape)).astype(np.float32)
    w = torch.hamming_window(400)
    st = torch.stft(torch.tensor(x), 400, 100, window=w, onesided=True,
                    return_complex=True)
    comp = torch.polar(st.abs() ** 0.3, st.angle())
    ns = torch.stft(torch.tensor(n), 400, 100, window=w, onesided=True,
                    return_complex=True)
    ncomp = torch.polar(ns.abs() ** 0.3, ns.angle())
    t = np.array([3, 17])
    with torch.no_grad():
        rr, ii = ts(comp, ncomp, torch.tensor(t))
    rr = rr.squeeze(1).numpy()
    ii = ii.squeeze(1).numpy()

    jts = DiffusionTSCNet(num_channel=64, num_features=201, num_steps=50)
    jr, ji = jts.apply(
        tvars, jnp.asarray(comp.numpy().transpose(0, 2, 1)),
        jnp.asarray(ncomp.numpy().transpose(0, 2, 1)), jnp.asarray(t),
        deterministic=True,
    )
    rel_r = np.sqrt(np.mean((rr - np.asarray(jr)) ** 2) / np.mean(rr**2))
    rel_i = np.sqrt(np.mean((ii - np.asarray(ji)) ** 2) / np.mean(ii**2))
    assert rel_r < 1e-4, rel_r
    assert rel_i < 1e-4, rel_i


def test_convert_checkpoint_cli_diffusion(ref_diffusion_modules, tmp_path):
    """The converter CLI auto-detects all three diffusion checkpoint
    layouts and writes a variables dir that round-trips bit-exactly
    through the serving loaders."""
    import jax
    import jax.numpy as jnp

    from speech_enhancement_tpu.cli import convert_checkpoint as cc
    from speech_enhancement_tpu.utils.checkpoint import load_variables
    from speech_enhancement_tpu.utils.convert_torch import convert_checkpoint

    TorchDiffuSE, TorchTSCDiffusion, CdiffuseTorch = ref_diffusion_modules

    # main_diffuse 'diffuse' layout (main_diffuse.py:329-336), DDP prefix
    torch.manual_seed(3)
    tm = TorchDiffuSE(10, 100, 201, SCHED, 32, 6)
    ckpt = tmp_path / "diffuse.pth.tar"
    torch.save({"epoch": 1, "arch": "diffuse",
                "state_dict": {f"module.{k}": v
                               for k, v in tm.state_dict().items()}}, ckpt)
    out = tmp_path / "conv_diffuse"
    assert cc.main([str(ckpt), str(out)]) == 0
    expected = convert_checkpoint(str(ckpt))["model"]
    restored = load_variables(str(out), expected)
    same = jax.tree_util.tree_map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        restored, expected)
    assert all(jax.tree_util.tree_leaves(same))

    # tsc layout
    torch.manual_seed(4)
    ts = TorchTSCDiffusion(num_channel=64, num_features=201,
                           noise_schedule=SCHED)
    ckpt2 = tmp_path / "tsc.pth.tar"
    torch.save({"epoch": 1, "arch": "tsc-diffuse",
                "state_dict": ts.state_dict()}, ckpt2)
    out2 = tmp_path / "conv_tsc"
    assert cc.main([str(ckpt2), str(out2)]) == 0
    assert (out2 / "variables").is_dir()

    # cdiffuse weights.pt layout (cdiffuse/learner.py:60-72), served by
    # cdiffuse_inference.load_model via its converted-variables branch
    class P(dict):
        __getattr__ = dict.__getitem__

    p = P(dilation_cycle_length=10, residual_channels=64,
          residual_layers=30, noise_schedule=SCHED, n_mels=201)
    torch.manual_seed(5)
    cm = CdiffuseTorch(None, p)
    wpt = tmp_path / "weights.pt"
    torch.save({"step": 7, "model": cm.state_dict(), "optimizer": {},
                "params": dict(p), "scaler": {}}, wpt)
    out3 = tmp_path / "conv_cdiffuse"
    assert cc.main([str(wpt), str(out3)]) == 0

    from speech_enhancement_tpu.cli import cdiffuse_inference

    model, variables = cdiffuse_inference.load_model(str(out3))
    # the model config is inferred FROM the weights: upstream checkpoints
    # carry the vendored 16x upsampler => hop 256, no GroupNorm
    assert model.hop_length == 256
    assert not model.use_groupnorm
    got = np.asarray(
        variables["params"]["residual0"]["dilated_conv"]["kernel"]
    )
    want = cm.residual_layers[0].dilated_conv.weight.detach().numpy()
    np.testing.assert_array_equal(got, want.transpose(2, 1, 0))

    # a wrong-arch tag on a tsc state_dict is still detected structurally
    ckpt3 = tmp_path / "untagged.pth.tar"
    torch.save({"state_dict": ts.state_dict()}, ckpt3)
    det = convert_checkpoint(str(ckpt3))
    assert det["arch"].startswith("tsc")
    # ... and a CONTRADICTING tag loses to the structure (a truthy wrong
    # tag used to survive and crash the verifier / print a broken serve
    # command) — both directions
    torch.save({"arch": "diffuse", "state_dict": ts.state_dict()}, ckpt3)
    assert convert_checkpoint(str(ckpt3))["arch"] == "tsc-diffuse"
    torch.save({"arch": "tsc-diffuse",
                "state_dict": tm.state_dict()}, ckpt3)
    assert convert_checkpoint(str(ckpt3))["arch"] == "diffuse"

    # non-default learner params (cdiffuse/learner.py:60-72 saves them
    # next to the weights): dilation_cycle_length and the noise schedule
    # are NOT shape-visible, so they must ride along as params.json and
    # drive the served model + reverse schedule
    # NOTE the schedule must stay inside the CDiffuSE reverse algebra's
    # domain (see inference_schedule's guard): every intermediate
    # alpha_cum > 0.382 and the final one < 0.5 — 20 steps to 0.09 gives
    # alpha_cum[-2] ~ 0.43, alpha_cum[-1] ~ 0.395
    pnd = P(dilation_cycle_length=3, residual_channels=8,
            residual_layers=2,
            noise_schedule=np.linspace(1e-4, 0.09, 20).tolist(), n_mels=80)
    torch.manual_seed(7)
    cmnd = CdiffuseTorch(None, pnd)
    wptnd = tmp_path / "weights_nondefault.pt"
    torch.save({"step": 7, "model": cmnd.state_dict(), "optimizer": {},
                "params": dict(pnd), "scaler": {}}, wptnd)
    outnd = tmp_path / "conv_cdiffuse_nondefault"
    assert cc.main([str(wptnd), str(outnd)]) == 0
    assert (outnd / "params.json").exists()
    modelnd, _ = cdiffuse_inference.load_model(str(outnd))
    assert modelnd.dilation_cycle_length == 3
    assert modelnd.num_steps == 20
    noisy = 0.1 * np.random.default_rng(10).standard_normal(2048)
    # non-fast sampling runs the TRAINING schedule — all 20 saved steps
    est = cdiffuse_inference.predict(noisy.astype(np.float32), str(outnd))
    assert est.shape == noisy.shape
    assert np.isfinite(est).all()

    # a reference-DEFAULT mel checkpoint (cdiffuse/params.py n_mels=80)
    # must SERVE end-to-end: predict() builds the matching-width mel
    # conditioner (preprocess.py:76-92) rather than feeding the 201-bin
    # |STFT| into an 80-channel conditioner_projection
    p80 = P(dilation_cycle_length=10, residual_channels=8,
            residual_layers=2, noise_schedule=SCHED, n_mels=80)
    torch.manual_seed(6)
    cm80 = CdiffuseTorch(None, p80)
    wpt80 = tmp_path / "weights80.pt"
    torch.save({"step": 7, "model": cm80.state_dict(), "optimizer": {},
                "params": dict(p80), "scaler": {}}, wpt80)
    out80 = tmp_path / "conv_cdiffuse80"
    assert cc.main([str(wpt80), str(out80)]) == 0
    model80, _ = cdiffuse_inference.load_model(str(out80))
    assert model80.n_specs == 80
    noisy = 0.1 * np.random.default_rng(9).standard_normal(2048)
    est = cdiffuse_inference.predict(noisy.astype(np.float32), str(out80),
                                     fast=True)
    assert est.shape == noisy.shape
    assert np.isfinite(est).all()


def test_se_conditioner_matches_torch_stft():
    """_se_conditioner reproduces make_spectrum's framing (librosa
    center/reflect STFT, symmetric hamming, log1p magnitude,
    cdiffuse/preprocess.py:33-57) — pinned against torch.stft, whose
    center/reflect conventions match librosa's."""
    from speech_enhancement_tpu.cli.cdiffuse_inference import _se_conditioner

    rng = np.random.default_rng(0)
    y = rng.standard_normal(3000).astype(np.float32)
    got = _se_conditioner(y, 400, 100)[0]
    w = torch.hamming_window(400, periodic=False, dtype=torch.float64)
    yt = torch.tensor((y / np.abs(y).max()).astype(np.float64))
    st = torch.stft(yt, 400, 100, win_length=400, window=w, center=True,
                    pad_mode="reflect", onesided=True, return_complex=True)
    want = np.log1p(st.abs().numpy().T)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def ref_inference_gan(ref_modules):
    """Import the reference's ACTUAL inference_gan module (its unused-at-
    load-time heavy deps — librosa/torchaudio/tqdm/timm/yacs — stubbed)."""
    import copy

    for name in ("librosa", "torchaudio", "tqdm"):
        mod = types.ModuleType(name)
        mod.tqdm = lambda x, **k: x
        sys.modules.setdefault(name, mod)
    timm = types.ModuleType("timm")
    timm_utils = types.ModuleType("timm.utils")
    timm_utils.AverageMeter = type("AverageMeter", (), {})
    timm.utils = timm_utils
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.utils", timm_utils)

    class _CN(dict):
        def __init__(self, *a, **k):
            super().__init__()

        def __setattr__(self, k, v):
            self[k] = v

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def clone(self):
            return copy.deepcopy(self)

        def freeze(self, *a):
            pass

        defrost = freeze
        merge_from_file = merge_from_list = lambda self, x: None

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = _CN
    yacs.config = yacs_config
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", yacs_config)

    sys.path.insert(0, REFERENCE)
    try:
        import inference_gan as ref_ig
    finally:
        sys.path.pop(0)
    return ref_ig


def test_roundtrip_export(ref_inference_gan, tmp_path):
    """Reverse exporter: a TPU-trained TSCNet+Discriminator written as a
    reference-layout .pth.tar is loaded by the reference's own
    ``inference_gan.load_model`` (inference_gan.py:60-72) and reproduces
    the flax forward ≤3e-5 — a round trip that independently validates
    BOTH converters, and lets TPU-trained models be verified inside the
    reference stack."""
    import jax
    import jax.numpy as jnp

    from speech_enhancement_tpu.models import Discriminator, TSCNet
    from speech_enhancement_tpu.ops import compressed_stft
    from speech_enhancement_tpu.utils.convert_torch import convert_checkpoint

    rng = np.random.default_rng(0)
    model = TSCNet(num_channel=64, num_features=201)
    x = 0.1 * rng.standard_normal((2, 16000)).astype(np.float32)
    spec = compressed_stft(jnp.asarray(x), 400, 100, comp_type="pow")
    vs = jax.device_get(jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        spec,
    ))
    # perturb batch_stats away from init (mean 0 / var 1) so the BN
    # running-stat export is actually exercised
    bs = jax.tree_util.tree_map(
        lambda l: np.asarray(l)
        + 0.05 * rng.standard_normal(l.shape).astype(np.asarray(l).dtype),
        vs["batch_stats"],
    )
    vs = dict(vs, batch_stats=bs)
    disc = Discriminator(ndf=16)
    mag = jnp.abs(spec)
    dvs = jax.device_get(jax.jit(disc.init)(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        mag, mag,
    ))

    # export through the CLI flag (which wraps export_checkpoint) so the
    # user-facing --to-torch path is what's validated
    import orbax.checkpoint as ocp

    from speech_enhancement_tpu.cli import convert_checkpoint as cc

    ckpt_dir = tmp_path / "tpu_ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir / "variables", {"gen": vs, "disc": dvs})
    ckptr.wait_until_finished()
    exported = tmp_path / "exported.pth.tar"
    assert cc.main([str(ckpt_dir), str(exported), "--to-torch",
                    "--epoch", "7"]) == 0

    tm = ref_inference_gan.load_model(
        str(exported), types.SimpleNamespace(N_FFT=400),
        device=torch.device("cpu"),
    )
    w = torch.hamming_window(400)
    st = torch.stft(torch.tensor(x), 400, 100, window=w, onesided=True,
                    return_complex=True)
    comp = torch.polar(st.abs() ** 0.3, st.angle())
    with torch.no_grad():
        tr, ti = tm(comp)
    tr = tr.squeeze(1).numpy()
    ti = ti.squeeze(1).numpy()
    jr, ji = model.apply(vs, spec, deterministic=True)
    rel_r = np.sqrt(np.mean((tr - np.asarray(jr)) ** 2) / np.mean(tr**2))
    rel_i = np.sqrt(np.mean((ti - np.asarray(ji)) ** 2) / np.mean(ti**2))
    # measured 1.2e-5: the same fp32 torch-stft-vs-MXU-DFT input noise the
    # forward parity test bounds at 1e-4, amplified slightly by the
    # perturbed (≠ identity) BN running stats; the weight mapping itself
    # is pinned bit-exact by the round trip below
    assert rel_r < 3e-5, rel_r
    assert rel_i < 3e-5, rel_i

    # export -> convert round-trips BIT-EXACTLY for gen and disc
    back = convert_checkpoint(str(exported))
    for name, orig in (("gen", dict(vs)), ("disc", dict(dvs))):
        same = jax.tree_util.tree_map(
            lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
            back[name], orig,
        )
        assert all(jax.tree_util.tree_leaves(same)), name


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
