"""compare_outputs.py CLI: text + label agreement between two result dumps
(the quality-parity tool for when pretrained weights are mounted)."""

import subprocess
import sys

import numpy as np


def test_compare_outputs_cli(tmp_path):
    ours = {"c1": "happy and excited", "c2": "sad", "c3": "angry tone"}
    ref = {"c1": "happy and excited", "c2": "calm", "c4": "surprised"}
    a = tmp_path / "ours.npz"
    b = tmp_path / "ref.npz"
    np.savez(a, name2reason=ours)
    np.savez(b, name2reason=ref)
    out = subprocess.run(
        [sys.executable, "compare_outputs.py", "--ours", str(a),
         "--reference", str(b), "--no-llm"],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/local/bin:/usr/bin:/bin", "HOME": "/root"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    log = out.stdout + out.stderr
    assert "2 common clips" in log
    assert "exact text match: 1/2" in log
    assert "label-set agreement" in log
