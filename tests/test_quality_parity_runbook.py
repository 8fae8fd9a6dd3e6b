"""Quality-parity runbook (scripts/run_quality_parity.py): command
construction and sweep-output parsing (the 100-epoch run itself needs a
real VoiceBank drop)."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def test_dry_run_prints_reference_recipe(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "scripts", "run_quality_parity.py"),
         "--train-clean", str(tmp_path), "--train-noisy", str(tmp_path),
         "--test-clean", str(tmp_path), "--test-noisy", str(tmp_path),
         "--arch", "scp", "cmgan", "-o", str(tmp_path / "runs"),
         "--dry-run"],
        text=True, capture_output=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    # the reference recipe: MSE criterion, gen-first, resume auto, both
    # archs, the best-PESQ sweep, and the SCP loss-weight overlay
    assert "-a scp" in out.stdout and "-a cmgan" in out.stdout
    assert "--criterion mse" in out.stdout
    assert "--gen-first" in out.stdout
    assert "--resume auto" in out.stdout
    assert "--validate-epochs" in out.stdout
    assert "[0.3,0.7,0.2,0.05]" in out.stdout  # scp.yaml:6 weights
    assert "[0.1,0.9,0.2,0.05]" in out.stdout  # cmgan baseline weights
    assert (tmp_path / "runs" / "parity.yaml").exists()


def test_parse_sweep_output():
    from scripts.run_quality_parity import parse_sweep_output

    text = (
        "Epoch: 98\n"
        "pesq: 3.101\t csig: 4.400\t cbak: 3.700\t covl: 3.800\t "
        "ssnr: 10.100\t stoi: 0.950\n"
        "Epoch: 99\n"
        "pesq: 3.201\t csig: 4.500\t cbak: 3.800\t covl: 3.900\t "
        "ssnr: 10.200\t stoi: 0.955\n"
        "Best epoch: 99\t best PESQ: 3.201\n"
    )
    epoch, row = parse_sweep_output(text)
    assert epoch == 99
    assert row == (3.201, 4.5, 3.8, 3.9, 10.2, 0.955)
