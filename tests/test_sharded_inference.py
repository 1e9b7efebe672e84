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


def test_dp_sharded_realtime_encode_matches_replicated(eight_devices):
    """The REALTIME encode path — uint8 frames/faces → CLIP ViT, waveforms
    → HuBERT → mergers → splice → greedy decode — under a dp×tp mesh must
    reproduce the unsharded features and tokens (encoders replicate, batch
    shards over dp; GSPMD splits the towers batch-parallel). This is the
    one mode whose one-chip ceiling requires multi-chip (reference realtime
    encode path: my_affectgpt/models/encoder.py:197-208,418-432)."""
    from affectgpt_tpu.inference import chat as chat_mod
    from affectgpt_tpu.models import clip_vit, hubert

    cfg = affectgpt.AffectGPTConfig.tiny()
    vision_cfg = clip_vit.ClipVisionConfig.tiny()  # projection_dim == visual_dim
    audio_cfg = hubert.HubertConfig.tiny()  # hidden_size == acoustic_dim
    frozen = dict(affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32))
    frozen["visual_encoder"] = clip_vit.init_vision_params(
        jax.random.PRNGKey(4), vision_cfg, dtype=jnp.float32
    )
    frozen["acoustic_encoder"] = hubert.init_params(
        jax.random.PRNGKey(5), audio_cfg, dtype=jnp.float32
    )
    trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)

    b, t = 8, 24
    rng = np.random.RandomState(7)
    raw = {
        "frame": jnp.asarray(rng.randint(0, 255, (b, 2, 28, 28, 3)), jnp.uint8),
        "face": jnp.asarray(rng.randint(0, 255, (b, 2, 28, 28, 3)), jnp.uint8),
        "audio": jnp.asarray(rng.randn(b, 2, 1, 800), jnp.float32),
    }
    ids = rng.randint(1, 250, (b, t)).astype(np.int32)
    offsets_host = {"multi": 2, "audio": 5, "face": 9, "frame": 13}
    q = {"multi": cfg.num_multi_query_token, "audio": cfg.num_audio_query_token,
         "face": cfg.num_video_query_token, "frame": cfg.num_video_query_token}
    for m, off in offsets_host.items():
        ids[:, off : off + q[m]] = 0
    ids = jnp.asarray(ids)
    offsets = {m: jnp.full((b,), off, jnp.int32) for m, off in offsets_host.items()}
    lengths = jnp.full((b,), t, jnp.int32)
    gcfg = gen.GenerateConfig(max_new_tokens=5, do_sample=False, eos_token_id=257)

    @jax.jit
    def run(frozen, trainable, raw, ids, lengths):
        feats = chat_mod.encode_media_features(
            frozen, cfg, raw, vision_cfg=vision_cfg, audio_cfg=audio_cfg
        )
        embeds = affectgpt.build_inputs_embeds(frozen, trainable, cfg, ids, feats, offsets)
        toks, _ = gen.generate(
            frozen["llm"], cfg.llm, gcfg, embeds, lengths, jax.random.PRNGKey(3),
            max_len=48, lora=trainable["lora"],
        )
        return feats, toks

    ref_feats, ref_toks = run(frozen, trainable, raw, ids, lengths)

    mesh = mesh_lib.create_mesh(eight_devices, tp=2)  # dp=4 × tp=2
    frozen_sh = mesh_lib.shard_params(mesh, frozen)
    trainable_sh = mesh_lib.shard_params(mesh, trainable)
    raw_dp = jax.device_put(raw, mesh_lib.batch_shardings(mesh, raw))
    ids_dp = jax.device_put(ids, mesh_lib.batch_sharding(mesh))
    len_dp = jax.device_put(lengths, mesh_lib.batch_sharding(mesh))
    dp_feats, dp_toks = run(frozen_sh, trainable_sh, raw_dp, ids_dp, len_dp)

    assert set(dp_feats) == {"frame", "face", "audio"}
    for m in ref_feats:
        np.testing.assert_allclose(
            np.asarray(ref_feats[m]), np.asarray(dp_feats[m]), rtol=1e-5, atol=1e-5,
            err_msg=f"dp-sharded {m} encoder diverged",
        )
    np.testing.assert_array_equal(np.asarray(ref_toks), np.asarray(dp_toks))


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
