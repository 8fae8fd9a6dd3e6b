"""Training-to-quality evidence for the DIFFUSION paths: the checked-in
proxy run (scripts/train_diffusion_proxy.py on TPU — cli.main_diffuse
training + cli.inference_diffuse reverse-sampler sweep) must show the
sampled output improving PESQ over the noisy baseline.  Pins the
conclusion like tests/test_quality_proxy.py does for the GAN recipe.
"""

import os
import re

import pytest

DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "docs")
ARTIFACTS = [
    "diffusion_proxy_run.md",            # tsc-diffuse arch
    "diffusion_waveform_proxy_run.md",   # waveform DiffuSE arch
]


def test_diffusion_proxy_artifacts():
    found = [p for p in ARTIFACTS if os.path.exists(os.path.join(DOCS, p))]
    if not found:
        pytest.skip("diffusion proxy not yet run on this machine")
    for name in found:
        text = open(os.path.join(DOCS, name)).read()
        m = re.search(
            r"PESQ ([\d.]+) vs noisy ([\d.]+) \(Δ ([+-][\d.]+)\)", text,
        )
        assert m, f"{name} missing the summary line"
        assert float(m.group(3)) > 0, (
            f"{name}: sampled PESQ must beat noisy (Δ={m.group(3)})"
        )
