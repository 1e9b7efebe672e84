"""scripts/quality_run.sh --synthetic: the staged first-quality-run
sequence (corpus -> greedy inference -> judge -> score) must run end to
end as real subprocesses with random weights, so a real-weights run is
zero-engineering the moment checkpoints are mounted."""

import os
import subprocess
import sys


def test_quality_run_synthetic(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        ["bash", "scripts/quality_run.sh", "--synthetic", str(tmp_path)],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "quality_run complete" in proc.stdout
    result_dir = tmp_path / "output" / "results" / "quality_run" / "result-mer2023"
    assert list(result_dir.glob("*.npz")), "no inference results written"
    # greedy + fixed seeds: a second inference pass must reproduce the
    # outputs byte-identically (resume skips; force a fresh dir via name)
    import numpy as np

    first = {
        k: v for k, v in np.load(
            sorted(result_dir.glob("*.npz"))[-1], allow_pickle=True
        )["name2reason"].tolist().items()
    }
    assert first and all(isinstance(v, str) for v in first.values())
