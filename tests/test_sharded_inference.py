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


def _make_requests(cfg, lengths=(6, 9, 5)):
    from affectgpt_tpu.inference.server import Request

    reqs = []
    for rid, length in enumerate(lengths):
        rng = np.random.RandomState(rid)
        ids = rng.randint(1, 250, length).astype(np.int32)
        ids[2 : 2 + cfg.num_video_query_token] = 0
        reqs.append(Request(
            request_id=rid, input_ids=ids,
            features={"face": rng.randn(8, cfg.visual_dim).astype(np.float32)},
            offsets={"face": 2}, max_new_tokens=4,
        ))
    return reqs


def test_tp_sharded_batch_server_matches_replicated(eight_devices):
    """The dense continuous-batching engine under a 1×tp mesh (weights
    col/row-parallel, cache over kv heads) must produce identical tokens."""
    from affectgpt_tpu.inference.server import BatchServer

    cfg = affectgpt.AffectGPTConfig.tiny()
    frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)
    from affectgpt_tpu.tokenization import ByteTokenizer

    tok = ByteTokenizer()
    ref = BatchServer(frozen, trainable, cfg, tok, max_slots=2, max_len=64)
    for r in _make_requests(cfg):
        ref.submit(r)
    ref_out = ref.run_until_drained()

    mesh = mesh_lib.create_mesh(eight_devices[:2], tp=2)
    tp = BatchServer(frozen, trainable, cfg, tok, max_slots=2, max_len=64, mesh=mesh)
    assert tp.cache[0]["k"].sharding.spec[1] == "tp"  # kv heads sharded
    for r in _make_requests(cfg):
        tp.submit(r)
    assert tp.run_until_drained() == ref_out


def test_tp_sharded_paged_server_matches_replicated(eight_devices):
    from affectgpt_tpu.inference.paged import PagedBatchServer, PagedConfig

    cfg = affectgpt.AffectGPTConfig.tiny()
    frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)
    from affectgpt_tpu.tokenization import ByteTokenizer

    tok = ByteTokenizer()
    pcfg = PagedConfig(block_size=4, num_blocks=64, max_blocks_per_seq=8)
    ref = PagedBatchServer(frozen, trainable, cfg, tok, pcfg=pcfg, max_slots=2)
    for r in _make_requests(cfg):
        ref.submit(r)
    ref_out = ref.run_until_drained()

    mesh = mesh_lib.create_mesh(eight_devices[:2], tp=2)
    tp = PagedBatchServer(frozen, trainable, cfg, tok, pcfg=pcfg, max_slots=2, mesh=mesh)
    assert tp.pools[0]["k"].sharding.spec[2] == "tp"
    for r in _make_requests(cfg):
        tp.submit(r)
    assert tp.run_until_drained() == ref_out


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


def test_mesh_engines_disable_fused_decode_kernels(eight_devices, monkeypatch):
    """A mesh-sharded engine must flip qwen2.TP_SERVING: the fused decode
    Pallas kernels carry no GSPMD partitioning rule, so under a sharded jit
    XLA would replicate their operands (per-layer weight all-gathers)."""
    from affectgpt_tpu.inference.server import BatchServer
    from affectgpt_tpu.models import qwen2
    from affectgpt_tpu.tokenization import ByteTokenizer

    monkeypatch.setenv("AFFECTGPT_DECODE_KERNEL_INTERPRET", "1")
    cfg = affectgpt.AffectGPTConfig.tiny()
    frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)
    assert qwen2._decode_kernel_backend_ok()  # interpret mode: kernels on
    mesh = mesh_lib.create_mesh(eight_devices[:2], tp=2)
    BatchServer(frozen, trainable, cfg, ByteTokenizer(), max_slots=2,
                max_len=64, mesh=mesh)
    assert qwen2.TP_SERVING and not qwen2._decode_kernel_backend_ok()
