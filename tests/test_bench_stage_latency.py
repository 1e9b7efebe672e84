"""bench_stage_latency entry smoke: all four stages measure and print."""

import json
import os
import subprocess
import sys


def test_stage_latency_smoke():
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/bench_stage_latency.py", "--samples", "5"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    stages = {l["metric"].split(": ")[1] for l in lines}
    assert stages == {"frame", "face", "audio", "au"}
    assert all(l["value"] > 0 for l in lines)
