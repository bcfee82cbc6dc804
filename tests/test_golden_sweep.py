"""Golden regression sweep as a test: all 13 modes (0-12) on the committed synthetic
fixture with the tiny seed-0 model must reproduce the committed
PSNR/SSIM/SAM goldens (scripts/golden_sweep.py) — the guard that
kernel/perf work can't silently bend numerics."""

import json
import os

def test_golden_sweep(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import golden_sweep as GS

    with open(GS.GOLDEN_PATH) as f:
        goldens = json.load(f)
    results = GS.run_sweep(str(tmp_path))
    failures = GS.compare(results, goldens)
    assert not failures, failures
