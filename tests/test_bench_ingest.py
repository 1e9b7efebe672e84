"""bench_ingest entry smoke: both sampling modes decode through the
native-AVI and mp4 tiers and the ratio line prints."""

import json
import os
import subprocess
import sys

import pytest

REFERENCE_MP4 = "/root/reference/AffectGPT/demo/sample_00000000.mp4"


@pytest.mark.skipif(not os.path.exists(REFERENCE_MP4), reason="demo clip absent")
def test_bench_ingest_smoke():
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/bench_ingest.py", "--clips", "2"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    metrics = {l["metric"]: l["value"] for l in lines}
    assert any("native_mjpeg_avi, uniform" in m for m in metrics)
    ratio = [v for m, v in metrics.items() if "throughput ratio" in m]
    assert ratio and 0.2 < ratio[0] < 5.0
