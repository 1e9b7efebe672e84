"""Real multi-process training: 2 jax.distributed processes (localhost
coordinator, 4 virtual CPU devices each = 8 global) run one dp=8 train
step on a fixed global batch fed via make_array_from_process_local_data,
and their loss must equal the single-process 8-device run bit-for-bit
(the role of the reference's torchrun + DistributedSampler + NCCL path,
my_affectgpt/common/dist_utils.py:54-79). Also covers the collective
checkpoint save (process 0 writes) and MetricLogger process sync."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step_matches_single(tmp_path, eight_devices):
    import jax

    from affectgpt_tpu.models import affectgpt
    from affectgpt_tpu.parallel import mesh as mesh_lib
    from affectgpt_tpu.training import optim, train_step
    from tests.test_train_multichip import make_batch

    # ---- single-process control on the in-process 8-device mesh ----
    cfg = affectgpt.AffectGPTConfig.tiny()
    mesh = mesh_lib.create_mesh(eight_devices, tp=1)
    frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=np.float32)
    trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)
    schedule = optim.linear_warmup_cosine_lr(1e-3, 1e-5, warmup_steps=2, total_steps=10)
    tx = optim.make_optimizer(schedule, max_grad_norm=1.0)
    state = train_step.shard_state(mesh, train_step.create_train_state(trainable, tx))
    frozen_sharded = mesh_lib.shard_params(mesh, frozen)
    batch = make_batch(cfg, b=8)
    batch = jax.device_put(batch, jax.tree.map(lambda _: mesh_lib.batch_sharding(mesh), batch))
    step_fn = train_step.compile_train_step(mesh, cfg, tx, state, frozen_sharded)
    _, metrics = step_fn(state, frozen_sharded, batch)
    control_loss = float(metrics["loss"])

    # ---- two real processes ----
    coordinator = f"127.0.0.1:{_free_port()}"
    env_base = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": "/root/repo",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    }
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"result_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(os.path.dirname(__file__), "multihost_worker.py"),
             coordinator, "2", str(pid), str(out), str(tmp_path / "ckpt")],
            env=env_base, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = [json.loads(out.read_text()) for out in outs]
    for r in results:
        assert abs(r["loss"] - control_loss) < 1e-5, (r, control_loss)
        assert r["metric_global_avg"] == pytest.approx(2.0)
    # process 0 wrote the checkpoint; process 1 did not double-write
    assert os.path.isdir(results[0]["ckpt_path"])
