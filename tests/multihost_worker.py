"""Worker for the 2-process jax.distributed CPU test (test_multihost.py).

Each process owns 4 virtual CPU devices (8 global), initializes the
distributed runtime against a localhost coordinator, feeds ITS HALF of a
fixed global batch through jax.make_array_from_process_local_data (the
runner's multihost data path), runs one dp=8 train step, exercises the
collective checkpoint save and MetricLogger cross-process sync, and
writes its observed numbers to a JSON file for the parent test.

Run (by the test):
  python tests/multihost_worker.py <coordinator> <n_proc> <pid> <outfile> <ckptdir>
"""

import json
import sys

import jax


def main():
    coordinator, n_proc, pid, outfile, ckptdir = sys.argv[1:6]
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(n_proc),
        process_id=int(pid),
    )
    assert jax.process_count() == int(n_proc)
    assert len(jax.devices()) == 8, len(jax.devices())

    import numpy as np

    from affectgpt_tpu.models import affectgpt
    from affectgpt_tpu.parallel import mesh as mesh_lib
    from affectgpt_tpu.training import checkpoint, optim, train_step
    from affectgpt_tpu.utils.logging import MetricLogger
    from tests.test_train_multichip import make_batch

    cfg = affectgpt.AffectGPTConfig.tiny()
    mesh = mesh_lib.create_mesh(tp=1)
    frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp_f32())
    trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)
    schedule = optim.linear_warmup_cosine_lr(1e-3, 1e-5, warmup_steps=2, total_steps=10)
    tx = optim.make_optimizer(schedule, max_grad_norm=1.0)
    state = train_step.create_train_state(trainable, tx)
    state = train_step.shard_state(mesh, state)
    frozen = mesh_lib.shard_params(mesh, frozen)

    # global batch 8, rows [pid*4, pid*4+4) live on this process
    full = make_batch(cfg, b=8)
    lo, hi = int(pid) * 4, int(pid) * 4 + 4
    sharding = mesh_lib.batch_sharding(mesh)

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x)[lo:hi])

    batch = jax.tree.map(put, jax.tree.map(np.asarray, full))

    step_fn = train_step.compile_train_step(mesh, cfg, tx, state, frozen)
    state, metrics = step_fn(state, frozen, batch)
    loss = float(metrics["loss"])

    # collective checkpoint: every process calls, process 0 writes
    path = checkpoint.save_checkpoint(ckptdir, 1, state.trainable, step=1)

    # cross-process metric sync: different per-host meters → same global avg
    ml = MetricLogger()
    ml.update(loss=1.0 if int(pid) == 0 else 3.0)
    ml.synchronize_between_processes()

    with open(outfile, "w") as f:
        json.dump({
            "pid": int(pid),
            "loss": loss,
            "ckpt_path": path,
            "metric_global_avg": ml.meters["loss"].global_avg,
        }, f)


def jnp_f32():
    import jax.numpy as jnp

    return jnp.float32


if __name__ == "__main__":
    main()
