"""Training-to-quality evidence: the checked-in proxy run must show the
full SCP-GAN recipe (cli.main_gan -> cli.inference_gan checkpoint sweep,
reference inference_gan.py:134-152) improving PESQ and STOI over the noisy
baseline.  The artifact is produced on TPU by scripts/train_quality_proxy.py
(which itself exits non-zero unless enhanced beats noisy); this test pins
the conclusion so a regression that drops or degrades the artifact fails
the suite.
"""

import os
import re

import pytest

DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "quality_proxy_run.md")


def test_quality_proxy_artifact():
    if not os.path.exists(DOC):
        pytest.skip("quality proxy not yet run on this machine")
    text = open(DOC).read()
    m = re.search(
        r"PESQ ([\d.]+) vs noisy ([\d.]+) \(Δ ([+-][\d.]+)\); "
        r"STOI ([\d.]+) vs ([\d.]+) \(Δ ([+-][\d.]+)\)",
        text,
    )
    assert m, "quality_proxy_run.md missing the summary line"
    pesq_delta, stoi_delta = float(m.group(3)), float(m.group(6))
    assert pesq_delta > 0, f"enhanced PESQ must beat noisy (Δ={pesq_delta})"
    assert stoi_delta >= 0, f"enhanced STOI must not regress (Δ={stoi_delta})"
