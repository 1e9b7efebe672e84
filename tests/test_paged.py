"""Paged KV cache tests: allocator, page writes, and greedy decode parity
with the dense-cache generate path."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.inference import generate as gen
from affectgpt_tpu.inference import paged
from affectgpt_tpu.models import qwen2

CFG = qwen2.QwenConfig.tiny()
PARAMS = qwen2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
PCFG = paged.PagedConfig(block_size=4, num_blocks=32, max_blocks_per_seq=8)


class TestAllocator:
    def test_allocate_extend_free(self):
        alloc = paged.BlockAllocator(PCFG)
        table = alloc.allocate(9)  # 3 blocks of 4
        assert len(table) == 3 and 0 not in table
        alloc.extend(table, 13)  # needs a 4th block
        assert len(table) == 4
        before = len(alloc.free)
        alloc.free_table(table)
        assert len(alloc.free) == before + 4

    def test_pool_exhaustion(self):
        alloc = paged.BlockAllocator(PCFG)
        try:
            alloc.allocate(PCFG.num_blocks * PCFG.block_size * 2)
            assert False, "expected exhaustion"
        except RuntimeError:
            pass

    def test_reservations_block_admission(self):
        alloc = paged.BlockAllocator(PCFG)
        total = alloc.available()
        alloc.reserve(total - 1)
        assert alloc.available() == 1
        table = alloc.allocate(PCFG.block_size)  # 1 block still allowed
        try:
            alloc.allocate(1)
            assert False, "expected exhaustion: all remaining blocks reserved"
        except RuntimeError:
            pass
        alloc.release(2)
        alloc.allocate(1)
        alloc.free_table(table)


class TestPagedDecode:
    def test_greedy_matches_dense_generate(self):
        """Prefill→paged decode must reproduce the dense-cache greedy path."""
        t_prompt, n_new = 7, 6
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, t_prompt), 0, 250)
        embeds = qwen2.embed_tokens(PARAMS, ids)

        gcfg = gen.GenerateConfig(max_new_tokens=n_new, do_sample=False, eos_token_id=257)
        ref_tokens, ref_valid = gen.generate(
            PARAMS, CFG, gcfg, embeds, jnp.array([t_prompt]),
            jax.random.PRNGKey(2), max_len=32,
        )
        ref = list(np.asarray(ref_tokens[0][: int(ref_valid[0])]))

        pools = paged.init_paged_cache(CFG, PCFG, dtype=jnp.float32)
        alloc = paged.BlockAllocator(PCFG)
        table = alloc.allocate(t_prompt)
        table_padded = np.zeros(PCFG.max_blocks_per_seq, np.int32)
        table_padded[: len(table)] = table

        last_logits, pools = paged.prefill_into_pages(
            PARAMS, CFG, pools, embeds, table_padded, PCFG
        )
        tokens = [int(jnp.argmax(last_logits))]
        pos = t_prompt
        for _ in range(n_new - 1):
            if tokens[-1] == 257:
                break
            alloc.extend(table, pos + 1)
            table_padded[: len(table)] = table
            logits, pools = paged.paged_decode_step(
                PARAMS, CFG, pools, jnp.asarray([tokens[-1]]), jnp.asarray([pos]),
                jnp.asarray(table_padded[None]), PCFG,
            )
            tokens.append(int(jnp.argmax(logits[0])))
            pos += 1
        got = [t for t in tokens if t != 257][: len(ref)]
        assert got == ref, (got, ref)

    def test_bucketed_prefill_matches_exact(self):
        """End-padded (bucketed) prefill must produce the same last-token
        logits and page contents as the exact-length prefill."""
        t, bucket = 7, 12
        ids = jax.random.randint(jax.random.PRNGKey(5), (1, t), 0, 250)
        embeds = qwen2.embed_tokens(PARAMS, ids)
        padded_embeds = jnp.pad(embeds, ((0, 0), (0, bucket - t), (0, 0)))

        def run(e, length):
            pools = paged.init_paged_cache(CFG, PCFG, dtype=jnp.float32)
            alloc = paged.BlockAllocator(PCFG)
            table = np.zeros(PCFG.max_blocks_per_seq, np.int32)
            real = alloc.allocate(t)
            table[: len(real)] = real
            logits, pools = paged.prefill_into_pages(
                PARAMS, CFG, pools, e, table, PCFG, length=length
            )
            return logits, pools, real

        exact_logits, exact_pools, exact_table = run(embeds, None)
        buck_logits, buck_pools, buck_table = run(padded_embeds, t)
        np.testing.assert_allclose(
            np.asarray(exact_logits), np.asarray(buck_logits), atol=2e-4, rtol=2e-4
        )
        # real pages hold identical K/V for the real token columns
        assert exact_table == buck_table
        idx = np.asarray(exact_table)
        for le, lb in zip(exact_pools, buck_pools):
            ke = np.asarray(le["k"][idx]).reshape(-1, *le["k"].shape[2:])[:t]
            kb = np.asarray(lb["k"][idx]).reshape(-1, *lb["k"].shape[2:])[:t]
            np.testing.assert_allclose(ke, kb, atol=2e-4, rtol=2e-4)

    def test_two_sequences_interleaved(self):
        """Two sequences with different lengths share the pool without
        interference."""
        pools = paged.init_paged_cache(CFG, PCFG, dtype=jnp.float32)
        alloc = paged.BlockAllocator(PCFG)
        seqs = []
        for i, t_prompt in enumerate((5, 9)):
            ids = jax.random.randint(jax.random.PRNGKey(10 + i), (1, t_prompt), 0, 250)
            embeds = qwen2.embed_tokens(PARAMS, ids)
            table = alloc.allocate(t_prompt)
            padded = np.zeros(PCFG.max_blocks_per_seq, np.int32)
            padded[: len(table)] = table
            logits, pools = paged.prefill_into_pages(PARAMS, CFG, pools, embeds, padded, PCFG)
            seqs.append({"ids": ids, "table": table, "padded": padded,
                         "pos": t_prompt, "tok": int(jnp.argmax(logits))})

        # joint decode step for both sequences
        for s in seqs:
            alloc.extend(s["table"], s["pos"] + 1)
            s["padded"][: len(s["table"])] = s["table"]
        tokens = jnp.asarray([s["tok"] for s in seqs])
        positions = jnp.asarray([s["pos"] for s in seqs])
        tables = jnp.asarray(np.stack([s["padded"] for s in seqs]))
        logits, pools = paged.paged_decode_step(PARAMS, CFG, pools, tokens, positions, tables, PCFG)

        # each row must match its single-sequence reference decode
        for i, s in enumerate(seqs):
            solo_pools = paged.init_paged_cache(CFG, PCFG, dtype=jnp.float32)
            solo_alloc = paged.BlockAllocator(PCFG)
            table = solo_alloc.allocate(s["pos"])
            padded = np.zeros(PCFG.max_blocks_per_seq, np.int32)
            padded[: len(table)] = table
            embeds = qwen2.embed_tokens(PARAMS, s["ids"])
            solo_logits, solo_pools = paged.prefill_into_pages(
                PARAMS, CFG, solo_pools, embeds, padded, PCFG
            )
            solo_alloc.extend(table, s["pos"] + 1)
            padded[: len(table)] = table
            step_logits, _ = paged.paged_decode_step(
                PARAMS, CFG, solo_pools, jnp.asarray([s["tok"]]),
                jnp.asarray([s["pos"]]), jnp.asarray(padded[None]), PCFG,
            )
            np.testing.assert_allclose(
                np.asarray(logits[i]), np.asarray(step_logits[0]), atol=2e-4, rtol=2e-4
            )


class TestPagedBatchServer:
    def test_matches_dense_server(self):
        from affectgpt_tpu.inference.paged import PagedBatchServer
        from affectgpt_tpu.inference.server import BatchServer, Request
        from affectgpt_tpu.models import affectgpt
        from affectgpt_tpu.tokenization import ByteTokenizer

        acfg = affectgpt.AffectGPTConfig.tiny()
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), acfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), acfg)
        tok = ByteTokenizer()

        def make_req(rid, length):
            rng = np.random.RandomState(rid)
            ids = rng.randint(1, 250, length).astype(np.int32)
            ids[2 : 2 + acfg.num_video_query_token] = 0
            return Request(
                request_id=rid, input_ids=ids,
                features={"face": rng.randn(8, acfg.visual_dim).astype(np.float32)},
                offsets={"face": 2}, max_new_tokens=4,
            )

        requests = [make_req(i, l) for i, l in enumerate([6, 9, 5])]
        dense = BatchServer(frozen, trainable, acfg, tok, max_slots=2, max_len=64)
        for r in requests:
            dense.submit(r)
        dense_out = dense.run_until_drained()

        pcfg = paged.PagedConfig(block_size=4, num_blocks=64, max_blocks_per_seq=8)
        pserver = PagedBatchServer(frozen, trainable, acfg, tok, pcfg=pcfg, max_slots=2)
        for r in requests:
            pserver.submit(r)
        paged_out = pserver.run_until_drained()
        assert paged_out == dense_out
        sla = pserver.clock.summary()
        assert sla["requests"] == len(requests)
        assert sla["e2e_p50_ms"] >= sla["ttft_p50_ms"] >= 0
        assert sla["mean_tokens"] > 0

        # optimistic admission on a pool too small for both full lifetimes:
        # prompts admit together (2 blocks each), decode growth drains the
        # 9-block pool, and the youngest slot is recompute-preempted; final
        # greedy outputs must STILL match the dense server exactly (the
        # preempted request re-prefills from its original prompt).
        tight = paged.PagedConfig(block_size=4, num_blocks=9, max_blocks_per_seq=8)
        long_reqs = [make_req(i, l) for i, l in enumerate([6, 7])]
        for r in long_reqs:
            r.max_new_tokens = 16
        dense2 = BatchServer(frozen, trainable, acfg, tok, max_slots=2, max_len=64)
        for r in long_reqs:
            dense2.submit(r)
        dense2_out = dense2.run_until_drained()
        oserver = PagedBatchServer(
            frozen, trainable, acfg, tok, pcfg=tight, max_slots=2,
            admission="optimistic",
        )
        for r in long_reqs:
            oserver.submit(r)
        opt_out = oserver.run_until_drained()
        assert opt_out == dense2_out
        assert oserver.stats["preemptions"] >= 1
        # reserve mode on the same tight pool serializes instead (second
        # request waits for the first's slot) — same outputs, no preemption
        rserver = PagedBatchServer(
            frozen, trainable, acfg, tok, pcfg=tight, max_slots=2,
        )
        for r in long_reqs:
            rserver.submit(r)
        assert rserver.run_until_drained() == dense2_out
        assert rserver.stats["preemptions"] == 0

        # boundary validation at submit: a prompt ≥ max_seq_len (32 here)
        # or a reserve-mode lifetime bigger than the whole pool can NEVER
        # be served — admitted anyway they would crash _admit mid-batch
        # (leaking blocks) or livelock the head of the queue
        import pytest

        vserver = PagedBatchServer(frozen, trainable, acfg, tok, pcfg=pcfg, max_slots=2)
        with pytest.raises(ValueError):
            vserver.submit(make_req(50, pcfg.max_seq_len))
        never_fits = make_req(51, 6)
        never_fits.max_new_tokens = 10_000  # lifetime ≫ pool, capped by table
        tiny_pool = paged.PagedConfig(block_size=4, num_blocks=4, max_blocks_per_seq=8)
        tserver = PagedBatchServer(frozen, trainable, acfg, tok, pcfg=tiny_pool, max_slots=2)
        with pytest.raises(ValueError):
            tserver.submit(never_fits)

        # mixed feature SHAPES with the same modality name must admit in
        # separate batches (np.stack would raise post-allocation, leaking
        # blocks) — outputs still match the dense server per request
        mserver = PagedBatchServer(frozen, trainable, acfg, tok, pcfg=pcfg, max_slots=2)
        shapeshift = make_req(60, 6)
        shapeshift.features = {"face": shapeshift.features["face"][:5]}
        mdense = BatchServer(frozen, trainable, acfg, tok, max_slots=2, max_len=64)
        for r in (make_req(61, 7), shapeshift):
            mserver.submit(r)
            mdense.submit(r)
        assert mserver.run_until_drained() == mdense.run_until_drained()

        # pool dtype defaults to the weight dtype (f32 here), not f32-always
        assert mserver.pools[0]["k"].dtype == jax.tree.leaves(frozen["llm"])[0].dtype

        # top-p sampling mode: same seed → deterministic, valid token ids
        outs = []
        for _ in range(2):
            sserver = PagedBatchServer(
                frozen, trainable, acfg, tok, pcfg=pcfg, max_slots=2,
                do_sample=True, top_p=0.9, seed=3,
            )
            for r in requests:
                sserver.submit(r)
            outs.append(sserver.run_until_drained())
        vocab = acfg.llm.vocab_size
        assert outs[0] == outs[1]
        assert set(outs[0]) == {r.request_id for r in requests}
        assert all(0 <= t < vocab for toks in outs[0].values() for t in toks)


class TestInt8PagedPool:
    """int8 quantized page pool: init shapes, quantize-on-write, and greedy
    parity with the fp pool through the full PagedBatchServer."""

    def test_pool_shapes(self):
        """Scale layout is geometry-gated: legacy [blocks, block, kv, 1]
        at small block·kv (faster scatters, measured at 3B); FLAT
        [blocks, block·kv] when block·kv ≥ 128 (a trailing kv/1 minor dim
        lane-pads 32-256× on TPU — the 7B s384 capacity-config OOM)."""
        pools = paged.init_paged_cache(CFG, PCFG, dtype=jnp.int8)
        p = pools[0]
        assert p["k"].dtype == jnp.int8
        assert p["k_scale"].shape == p["k"].shape[:3] + (1,)  # tiny → legacy
        assert p["k_scale"].dtype == jnp.float32

        wide = paged.PagedConfig(block_size=128 // CFG.num_kv_heads,
                                 num_blocks=8, max_blocks_per_seq=4)
        pw = paged.init_paged_cache(CFG, wide, dtype=jnp.int8)[0]
        assert pw["k_scale"].shape == (8, 128)  # flat, one exact lane row

    def test_write_quantizes(self):
        pools = paged.init_paged_cache(CFG, PCFG, dtype=jnp.int8)
        kv = CFG.num_kv_heads
        k_new = jax.random.normal(jax.random.PRNGKey(0), (2, kv, CFG.head_dim))
        v_new = jax.random.normal(jax.random.PRNGKey(1), (2, kv, CFG.head_dim))
        new = paged.paged_write(
            pools[0], k_new, v_new, jnp.array([1, 2]), jnp.array([0, 3]))
        recon = (np.asarray(new["k"][1, 0], np.float32)
                 * np.asarray(new["k_scale"][1, 0]))
        np.testing.assert_allclose(recon, np.asarray(k_new[0]), atol=0.02)

    def test_write_quantizes_flat_layout(self):
        """Same contract through the flat scale layout (block·kv ≥ 128)."""
        kv = CFG.num_kv_heads
        wide = paged.PagedConfig(block_size=128 // kv, num_blocks=8,
                                 max_blocks_per_seq=4)
        pools = paged.init_paged_cache(CFG, wide, dtype=jnp.int8)
        k_new = jax.random.normal(jax.random.PRNGKey(0), (2, kv, CFG.head_dim))
        v_new = jax.random.normal(jax.random.PRNGKey(1), (2, kv, CFG.head_dim))
        new = paged.paged_write(
            pools[0], k_new, v_new, jnp.array([1, 2]), jnp.array([0, 3]))
        # scale for (offset o, head h) lives at flat column o·kv + h
        recon = (np.asarray(new["k"][1, 0], np.float32)
                 * np.asarray(new["k_scale"][1, :kv])[:, None])
        np.testing.assert_allclose(recon, np.asarray(k_new[0]), atol=0.02)
        recon2 = (np.asarray(new["k"][2, 3], np.float32)
                  * np.asarray(new["k_scale"][2, 3 * kv:4 * kv])[:, None])
        np.testing.assert_allclose(recon2, np.asarray(k_new[1]), atol=0.02)

    def test_flat_layout_greedy_matches_dense(self):
        """Prefill→decode greedy parity through the FLAT scale layout
        (block·kv ≥ 128): the dense generate path is the oracle."""
        kv = CFG.num_kv_heads
        wide = paged.PagedConfig(block_size=128 // kv, num_blocks=8,
                                 max_blocks_per_seq=2)
        t_prompt, n_new = 7, 5
        ids = jax.random.randint(jax.random.PRNGKey(21), (1, t_prompt), 0, 250)
        embeds = qwen2.embed_tokens(PARAMS, ids)
        gcfg = gen.GenerateConfig(max_new_tokens=n_new, do_sample=False,
                                  eos_token_id=257)
        ref_tokens, ref_valid = gen.generate(
            PARAMS, CFG, gcfg, embeds, jnp.array([t_prompt]),
            jax.random.PRNGKey(2), max_len=32, cache_dtype=jnp.int8,
        )
        ref = list(np.asarray(ref_tokens[0][: int(ref_valid[0])]))

        pools = paged.init_paged_cache(CFG, wide, dtype=jnp.int8)
        assert pools[0]["k_scale"].ndim == 2  # flat layout engaged
        alloc = paged.BlockAllocator(wide)
        table = alloc.allocate(t_prompt)
        padded = np.zeros(wide.max_blocks_per_seq, np.int32)
        padded[: len(table)] = table
        last_logits, pools = paged.prefill_into_pages(
            PARAMS, CFG, pools, embeds, padded, wide)
        tokens = [int(jnp.argmax(last_logits))]
        pos = t_prompt
        for _ in range(n_new - 1):
            if tokens[-1] == 257:
                break
            alloc.extend(table, pos + 1)
            padded[: len(table)] = table
            logits, pools = paged.paged_decode_step(
                PARAMS, CFG, pools, jnp.asarray([tokens[-1]]),
                jnp.asarray([pos]), jnp.asarray(padded[None]), wide)
            tokens.append(int(jnp.argmax(logits[0])))
            pos += 1
        got = [t for t in tokens if t != 257][: len(ref)]
        assert got == ref, (got, ref)

    def test_server_greedy_matches_fp_pool(self):
        from affectgpt_tpu.inference.paged import PagedBatchServer
        from affectgpt_tpu.inference.server import Request
        from affectgpt_tpu.models import affectgpt
        from affectgpt_tpu.tokenization import ByteTokenizer

        acfg = affectgpt.AffectGPTConfig.tiny()
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), acfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), acfg)
        tok = ByteTokenizer()

        def make_req(rid, length):
            rng = np.random.RandomState(rid)
            ids = rng.randint(1, 250, length).astype(np.int32)
            ids[2 : 2 + acfg.num_video_query_token] = 0
            return Request(
                request_id=rid, input_ids=ids,
                features={"face": rng.randn(8, acfg.visual_dim).astype(np.float32)},
                offsets={"face": 2}, max_new_tokens=4,
            )

        results = {}
        for name, dtype in [("fp", jnp.float32), ("int8", jnp.int8)]:
            server = PagedBatchServer(
                frozen, trainable, acfg, tok,
                pcfg=paged.PagedConfig(block_size=8, num_blocks=64, max_blocks_per_seq=16),
                max_slots=3, dtype=dtype)
            for rid, length in [(0, 9), (1, 14)]:
                server.submit(make_req(rid, length))
            results[name] = server.run_until_drained()
        assert results["int8"] == results["fp"]


def _make_affectgpt_req(acfg, rid, length, max_new_tokens=4):
    from affectgpt_tpu.inference.server import Request

    rng = np.random.RandomState(rid)
    ids = rng.randint(1, 250, length).astype(np.int32)
    ids[2 : 2 + acfg.num_video_query_token] = 0
    return Request(
        request_id=rid, input_ids=ids,
        features={"face": rng.randn(8, acfg.visual_dim).astype(np.float32)},
        offsets={"face": 2}, max_new_tokens=max_new_tokens,
    )


class TestInt8WeightsPaged:
    def test_quantized_lm_head_decodes(self):
        """--int8 (quantized weights: lm_head is {'w_q','scales'}) composed
        with --paged must not crash and must stay close to the fp path."""
        from affectgpt_tpu.inference.paged import PagedBatchServer
        from affectgpt_tpu.models import affectgpt
        from affectgpt_tpu.tokenization import ByteTokenizer

        acfg = affectgpt.AffectGPTConfig.tiny()
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), acfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), acfg)
        frozen_q = dict(frozen)
        frozen_q["llm"] = qwen2.quantize_params(frozen["llm"])
        assert "w_q" in frozen_q["llm"]["lm_head"]
        tok = ByteTokenizer()
        server = PagedBatchServer(
            frozen_q, trainable, acfg, tok,
            pcfg=paged.PagedConfig(block_size=8, num_blocks=64, max_blocks_per_seq=16),
            max_slots=2)
        for rid, length in [(0, 9), (1, 14)]:
            server.submit(_make_affectgpt_req(acfg, rid, length))
        out = server.run_until_drained()
        assert set(out) == {0, 1}
        assert all(0 <= t < acfg.llm.vocab_size for toks in out.values() for t in toks)


class TestInt4WeightsPaged:
    def test_int4_weights_through_paged_server(self):
        """--int4 composed with --paged: the paged engine's projections and
        lm_head route through _lora_dense, which must handle w_q4 leaves.
        tiny's K=32 falls back to int8, so use int4-groupable dims."""
        from affectgpt_tpu.inference.paged import PagedBatchServer
        from affectgpt_tpu.models import affectgpt
        from affectgpt_tpu.tokenization import ByteTokenizer

        llm = qwen2.QwenConfig(
            vocab_size=300, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
            rope_theta=10_000.0, lora_r=2, lora_alpha=4.0,
        )
        base = affectgpt.AffectGPTConfig.tiny()
        acfg = affectgpt.AffectGPTConfig(**{**base.__dict__, "llm": llm})
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), acfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), acfg)
        frozen_q = dict(frozen)
        frozen_q["llm"] = qwen2.quantize_params(frozen["llm"], bits=4)
        assert "w_q4" in frozen_q["llm"]["lm_head"]
        assert "w_q4" in frozen_q["llm"]["layers"][0]["q_proj"]
        tok = ByteTokenizer()
        server = PagedBatchServer(
            frozen_q, trainable, acfg, tok,
            pcfg=paged.PagedConfig(block_size=8, num_blocks=64, max_blocks_per_seq=16),
            max_slots=2)
        for rid, length in [(0, 9), (1, 14)]:
            server.submit(_make_affectgpt_req(acfg, rid, length))
        out = server.run_until_drained()
        assert set(out) == {0, 1}
        assert all(0 <= t < llm.vocab_size for toks in out.values() for t in toks)


class TestReservationPreventsMidDecodeExhaustion:
    def test_long_generations_never_abort(self):
        """A pool too small for every pending request at once must defer
        admissions, never die with 'pool exhausted' mid-decode."""
        from affectgpt_tpu.inference.paged import PagedBatchServer
        from affectgpt_tpu.models import affectgpt
        from affectgpt_tpu.tokenization import ByteTokenizer

        acfg = affectgpt.AffectGPTConfig.tiny()
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), acfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), acfg)
        tok = ByteTokenizer()
        # 15 usable blocks of 4 = 60 tokens; each request needs
        # ceil((9+20)/4)=8 blocks for its lifetime → only 1 admits at a time
        pcfg = paged.PagedConfig(block_size=4, num_blocks=16, max_blocks_per_seq=8)
        server = PagedBatchServer(frozen, trainable, acfg, tok, pcfg=pcfg, max_slots=4)
        for rid in range(4):
            server.submit(_make_affectgpt_req(acfg, rid, 9, max_new_tokens=20))
        out = server.run_until_drained()
        assert set(out) == {0, 1, 2, 3}
        assert server.alloc.reserved == 0
        assert len(server.alloc.free) == pcfg.num_blocks - 1


class TestFusedDecodeKernels:
    def test_fused_kernels_match_unfused_paged_step(self, monkeypatch):
        """The paged decode core with the fused qkv/MLP decode kernels
        (interpret mode; same dispatch as the dense decode step) is
        numerically identical to the per-projection path."""
        monkeypatch.setenv("AFFECTGPT_DECODE_KERNEL_INTERPRET", "1")
        cfg = qwen2.QwenConfig(
            vocab_size=64, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=2, num_kv_heads=2, head_dim=64,
        )
        params = qwen2.init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
        pcfg = paged.PagedConfig(block_size=4, num_blocks=64, max_blocks_per_seq=8)
        b = 8
        tokens = jnp.arange(b, dtype=jnp.int32) % cfg.vocab_size
        positions = jnp.asarray([3, 5, 1, 7, 2, 9, 4, 6], jnp.int32)
        tables = jnp.asarray(
            np.arange(1, 1 + b * pcfg.max_blocks_per_seq, dtype=np.int32).reshape(
                b, pcfg.max_blocks_per_seq
            )
        )

        def run():
            pools = paged.init_paged_cache(cfg, pcfg, dtype=jnp.float32)
            # pre-fill pools with deterministic junk so attention reads real data
            pools = jax.tree_util.tree_map(
                lambda p: p + 0.01 * jnp.arange(p.size, dtype=p.dtype).reshape(p.shape)
                if p.dtype != jnp.int32 else p,
                pools,
            )
            logits, new_pools = paged.paged_decode_step(
                params, cfg, pools, tokens, positions, tables, pcfg,
                use_pallas=False,
            )
            return np.asarray(logits), new_pools

        assert qwen2._decode_qkv_fused(
            params["layers"][0], None, cfg, jnp.zeros((b, cfg.hidden_size)), positions
        ) is not None, "gate must engage for this geometry"
        fused_logits, _ = run()
        monkeypatch.setenv("AFFECTGPT_DECODE_KERNEL_INTERPRET", "0")
        # the env toggle is read at TRACE time inside the jitted decode
        # step; without busting the jit cache the second run would replay
        # the fused program and the assert would compare it to itself
        jax.clear_caches()
        assert qwen2._decode_qkv_fused(
            params["layers"][0], None, cfg, jnp.zeros((b, cfg.hidden_size)), positions
        ) is None, "gate must DISENGAGE with the interpret env off (CPU)"
        unfused_logits, _ = run()
        np.testing.assert_allclose(fused_logits, unfused_logits, atol=2e-3, rtol=2e-3)


class TestGatherWidthBucketing:
    def test_bucketed_tables_match_full_width(self, monkeypatch):
        """Gather-width bucketing (tables sliced to the live power-of-two
        width) must produce identical tokens to full-width tables — the
        slice only removes pages no live position can index."""
        from affectgpt_tpu.inference.paged import PagedBatchServer, PagedConfig
        from affectgpt_tpu.models import affectgpt
        from affectgpt_tpu.tokenization import ByteTokenizer

        acfg = affectgpt.AffectGPTConfig.tiny()
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), acfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), acfg)
        tok = ByteTokenizer()
        # tables over-provisioned 4x: max_blocks 16 (64 tokens) vs
        # requests needing ceil((9+8)/4) = 5 blocks
        pcfg = PagedConfig(block_size=4, num_blocks=128, max_blocks_per_seq=16)

        def run():
            server = PagedBatchServer(
                frozen, trainable, acfg, tok, pcfg=pcfg, max_slots=4
            )
            for rid in range(4):
                server.submit(_make_affectgpt_req(acfg, rid, 9, max_new_tokens=8))
            out = server.run_until_drained()
            return out, server.stats

        monkeypatch.setenv("PAGED_GATHER_BUCKET", "0")
        full, full_stats = run()
        assert "gather_width_tokens" not in full_stats
        monkeypatch.setenv("PAGED_GATHER_BUCKET", "1")
        bucketed, b_stats = run()
        assert bucketed == full
        # the sliced width must actually have been narrower than max_blocks
        steps = b_stats["decode_steps"]
        assert b_stats["gather_width_tokens"] < steps * pcfg.max_seq_len


class TestChunkedPrefill:
    """prefill_chunk_tokens bounds each admission's prefill forward by
    total prompt tokens (scheduler-granularity chunked prefill). Greedy
    per-request outputs are independent of admission slicing — chunked
    and unchunked engines must produce identical results; the chunked
    engine must actually split the admissions."""

    def test_chunked_matches_unchunked(self):
        from affectgpt_tpu.inference.paged import PagedBatchServer
        from affectgpt_tpu.models import affectgpt
        from affectgpt_tpu.tokenization import ByteTokenizer

        acfg = affectgpt.AffectGPTConfig.tiny()
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), acfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), acfg)
        tok = ByteTokenizer()
        pcfg = paged.PagedConfig(block_size=8, num_blocks=96, max_blocks_per_seq=8)

        results, admissions = {}, {}
        for name, chunk in [("full", None), ("chunked", 20)]:
            server = PagedBatchServer(
                frozen, trainable, acfg, tok, pcfg=pcfg, max_slots=6,
                prefill_chunk_tokens=chunk)
            for rid, length in [(0, 9), (1, 14), (2, 11), (3, 7), (4, 13)]:
                server.submit(_make_affectgpt_req(acfg, rid, length))
            results[name] = server.run_until_drained()
            admissions[name] = server.stats["admissions"]
        assert results["chunked"] == results["full"]
        assert admissions["chunked"] > admissions["full"]

    def test_chunk_never_starves_a_single_request(self):
        """A prompt longer than the chunk budget must still admit (alone)."""
        from affectgpt_tpu.inference.paged import PagedBatchServer
        from affectgpt_tpu.models import affectgpt
        from affectgpt_tpu.tokenization import ByteTokenizer

        acfg = affectgpt.AffectGPTConfig.tiny()
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), acfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), acfg)
        pcfg = paged.PagedConfig(block_size=8, num_blocks=96, max_blocks_per_seq=8)
        server = PagedBatchServer(
            frozen, trainable, acfg, ByteTokenizer(), pcfg=pcfg, max_slots=4,
            prefill_chunk_tokens=4)  # smaller than every prompt
        for rid, length in [(0, 9), (1, 14)]:
            server.submit(_make_affectgpt_req(acfg, rid, length))
        out = server.run_until_drained()
        assert set(out) == {0, 1}
        assert server.stats["admissions"] == 2  # one request per admission
