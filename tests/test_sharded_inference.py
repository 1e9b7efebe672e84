"""Tensor-parallel inference: generate() over tp-sharded weights must
reproduce single-device outputs (GSPMD inserts the collectives)."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.inference import generate as gen
from affectgpt_tpu.models import affectgpt, qwen2
from affectgpt_tpu.parallel import mesh as mesh_lib


def test_tp_sharded_generate_matches_replicated(eight_devices):
    cfg = affectgpt.AffectGPTConfig.tiny()
    frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)
    gcfg = gen.GenerateConfig(max_new_tokens=6, do_sample=False, eos_token_id=257)

    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 7), 0, 250)
    embeds = qwen2.embed_tokens(frozen["llm"], ids)
    lengths = jnp.array([7, 5])

    ref_tokens, _ = gen.generate(
        frozen["llm"], cfg.llm, gcfg, embeds, lengths, jax.random.PRNGKey(3), max_len=16,
        lora=trainable["lora"],
    )

    mesh = mesh_lib.create_mesh(eight_devices, tp=4)
    frozen_sharded = mesh_lib.shard_params(mesh, frozen)
    lora_sharded = mesh_lib.shard_params(mesh, trainable)["lora"]
    tp_tokens, _ = gen.generate(
        frozen_sharded["llm"], cfg.llm, gcfg, embeds, lengths, jax.random.PRNGKey(3),
        max_len=16, lora=lora_sharded,
    )
    np.testing.assert_array_equal(np.asarray(ref_tokens), np.asarray(tp_tokens))


def test_dp_tp_sharded_generate_matches_replicated(eight_devices):
    """Pod-serving program: batch sharded over dp, weights over tp —
    one jit, GSPMD collectives over both axes."""
    cfg = affectgpt.AffectGPTConfig.tiny()
    frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)
    gcfg = gen.GenerateConfig(max_new_tokens=5, do_sample=False, eos_token_id=257)

    ids = jax.random.randint(jax.random.PRNGKey(2), (4, 9), 0, 250)
    embeds = qwen2.embed_tokens(frozen["llm"], ids)
    lengths = jnp.array([9, 5, 7, 8])

    ref_tokens, ref_valid = gen.generate(
        frozen["llm"], cfg.llm, gcfg, embeds, lengths, jax.random.PRNGKey(3),
        max_len=16, lora=trainable["lora"],
    )

    mesh = mesh_lib.create_mesh(eight_devices, tp=2)  # dp=4 × tp=2
    frozen_sharded = mesh_lib.shard_params(mesh, frozen)
    lora_sharded = mesh_lib.shard_params(mesh, trainable)["lora"]
    batch_sharding = mesh_lib.batch_sharding(mesh)
    embeds_dp = jax.device_put(embeds, batch_sharding)
    lengths_dp = jax.device_put(lengths, batch_sharding)
    dp_tokens, dp_valid = gen.generate(
        frozen_sharded["llm"], cfg.llm, gcfg, embeds_dp, lengths_dp,
        jax.random.PRNGKey(3), max_len=16, lora=lora_sharded,
    )
    np.testing.assert_array_equal(np.asarray(ref_tokens), np.asarray(dp_tokens))
    np.testing.assert_array_equal(np.asarray(ref_valid), np.asarray(dp_valid))
