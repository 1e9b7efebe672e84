"""End-to-end sharded training-step test on a virtual 8-device CPU mesh:
dp×tp = 4×2, tiny AffectGPT, full forward (mergers + pre-fusion + splice +
LoRA LLM) and optimizer update under one jit."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from affectgpt_tpu.models import affectgpt, qwen2
from affectgpt_tpu.parallel import mesh as mesh_lib
from affectgpt_tpu.training import optim, train_step


def make_batch(cfg: affectgpt.AffectGPTConfig, b=8, t=32, rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    nvq, naq, nmq = (
        cfg.num_video_query_token, cfg.num_audio_query_token, cfg.num_multi_query_token,
    )
    input_ids = rng.randint(1, 250, (b, t)).astype(np.int32)
    # carve out patch runs: multi at 2, audio at 5, face at 9, frame at 13
    offsets = {
        "multi": np.full((b,), 2, np.int32),
        "audio": np.full((b,), 5, np.int32),
        "face": np.full((b,), 9, np.int32),
        "frame": np.full((b,), 13, np.int32),
    }
    for m, off in offsets.items():
        q = {"multi": nmq, "audio": naq, "face": nvq, "frame": nvq}[m]
        for i in range(b):
            input_ids[i, off[i] : off[i] + q] = 0  # patch ids zeroed host-side
    labels = np.full((b, t), -100, np.int32)
    labels[:, t - 8 :] = rng.randint(1, 250, (b, 8))
    return {
        "input_ids": jnp.asarray(input_ids),
        "attention_mask": jnp.ones((b, t), jnp.float32),
        "labels": jnp.asarray(labels),
        "features": {
            "frame": jnp.asarray(rng.randn(b, 8, cfg.visual_dim), jnp.float32),
            "face": jnp.asarray(rng.randn(b, 8, cfg.visual_dim), jnp.float32),
            "audio": jnp.asarray(rng.randn(b, 8, cfg.acoustic_dim), jnp.float32),
        },
        "offsets": {k: jnp.asarray(v) for k, v in offsets.items()},
    }


class TestShardedTraining:
    def test_dp_tp_train_step(self, eight_devices):
        cfg = affectgpt.AffectGPTConfig.tiny()
        mesh = mesh_lib.create_mesh(eight_devices, tp=2)
        assert mesh.shape == {"dp": 4, "tp": 2}

        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)
        schedule = optim.linear_warmup_cosine_lr(1e-3, 1e-5, warmup_steps=2, total_steps=10)
        tx = optim.make_optimizer(schedule, max_grad_norm=1.0)
        state = train_step.create_train_state(trainable, tx)

        # shard everything
        state = train_step.shard_state(mesh, state)
        frozen_sharded = mesh_lib.shard_params(mesh, frozen)
        batch = jax.device_put(
            make_batch(cfg), jax.tree.map(lambda _: mesh_lib.batch_sharding(mesh), make_batch(cfg)),
        )

        # verify tp sharding actually applied to a column-parallel weight
        qw = state.trainable["lora"]["layers"][0]["q_proj"]["b"]
        assert qw.sharding.spec == P(None, "tp")
        base_qw = frozen_sharded["llm"]["layers"][0]["q_proj"]["w"]
        assert base_qw.sharding.spec == P(None, "tp")

        step_fn = train_step.compile_train_step(mesh, cfg, tx, state, frozen_sharded)
        losses = []
        for i in range(3):
            state, metrics = step_fn(state, frozen_sharded, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert int(state.step) == 3
        # optimizing on a fixed batch must reduce the loss
        assert losses[-1] < losses[0]

    def test_frozen_leaves_do_not_drift(self, eight_devices):
        # frozen_llm must freeze LoRA bit-exactly — including adamw weight
        # decay, which used to leak lr*wd*param into "frozen" leaves.
        cfg = affectgpt.AffectGPTConfig.tiny()
        mesh = mesh_lib.create_mesh(eight_devices, tp=1)
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)
        schedule = optim.linear_warmup_cosine_lr(1e-2, 1e-5, 0, 10)
        tx = optim.make_optimizer(schedule, weight_decay=0.05)
        mask = optim.freeze_mask_from_flags(trainable, {"frozen_llm": True})
        tx = optim.apply_freeze_mask(tx, mask)
        state = train_step.create_train_state(trainable, tx)
        state = train_step.shard_state(mesh, state)
        frozen_sharded = mesh_lib.shard_params(mesh, frozen)
        batch = jax.device_put(
            make_batch(cfg), jax.tree.map(lambda _: mesh_lib.batch_sharding(mesh), make_batch(cfg)),
        )
        step_fn = train_step.compile_train_step(mesh, cfg, tx, state, frozen_sharded)
        lora_before = jax.device_get(state.trainable["lora"])
        merger_before = np.asarray(jax.device_get(state.trainable["mergers"]["audio"]["proj"]["w"]))
        for _ in range(2):
            state, _ = step_fn(state, frozen_sharded, batch)
        lora_after = jax.device_get(state.trainable["lora"])
        jax.tree.map(np.testing.assert_array_equal, lora_before, lora_after)
        merger_after = np.asarray(jax.device_get(state.trainable["mergers"]["audio"]["proj"]["w"]))
        assert not np.array_equal(merger_before, merger_after)

    def test_grad_accumulation(self, eight_devices):
        cfg = affectgpt.AffectGPTConfig.tiny()
        mesh = mesh_lib.create_mesh(eight_devices, tp=1)
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)
        schedule = optim.linear_warmup_cosine_lr(1e-3, 1e-5, 0, 10)
        tx = optim.make_optimizer(schedule, accum_steps=2)
        state = train_step.create_train_state(trainable, tx)
        state = train_step.shard_state(mesh, state)
        frozen_sharded = mesh_lib.shard_params(mesh, frozen)
        batch = jax.device_put(
            make_batch(cfg), jax.tree.map(lambda _: mesh_lib.batch_sharding(mesh), make_batch(cfg)),
        )
        step_fn = train_step.compile_train_step(mesh, cfg, tx, state, frozen_sharded)
        before = np.asarray(jax.device_get(state.trainable["mergers"]["audio"]["proj"]["w"]))
        state, _ = step_fn(state, frozen_sharded, batch)  # accum step: no update yet
        mid = np.asarray(jax.device_get(state.trainable["mergers"]["audio"]["proj"]["w"]))
        np.testing.assert_array_equal(before, mid)
        state, _ = step_fn(state, frozen_sharded, batch)  # second: applies
        after = np.asarray(jax.device_get(state.trainable["mergers"]["audio"]["proj"]["w"]))
        assert not np.array_equal(mid, after)
