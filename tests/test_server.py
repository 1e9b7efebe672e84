"""Continuous-batching server tests: greedy outputs must match the
one-shot generate() path; slots recycle across waves of requests."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.inference import generate as gen
from affectgpt_tpu.inference.server import BatchServer, Request
from affectgpt_tpu.models import affectgpt
from affectgpt_tpu.tokenization import ByteTokenizer

CFG = affectgpt.AffectGPTConfig.tiny()
FROZEN = affectgpt.init_frozen(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
TRAINABLE = affectgpt.init_trainable(jax.random.PRNGKey(1), CFG)
TOK = ByteTokenizer()


def make_request(rid, length, max_new=5, seed=0):
    rng = np.random.RandomState(seed + rid)
    ids = rng.randint(1, 250, length).astype(np.int32)
    feats = {"face": rng.randn(8, CFG.visual_dim).astype(np.float32)}
    ids[2 : 2 + CFG.num_video_query_token] = 0
    return Request(
        request_id=rid, input_ids=ids, features=feats,
        offsets={"face": 2}, max_new_tokens=max_new,
    )


def reference_tokens(req):
    feats = {m: jnp.asarray(v[None]) for m, v in req.features.items()}
    offsets = {m: jnp.asarray([o], jnp.int32) for m, o in req.offsets.items()}
    embeds = affectgpt.build_inputs_embeds(
        FROZEN, TRAINABLE, CFG, jnp.asarray(req.input_ids[None]), feats, offsets
    )
    gcfg = gen.GenerateConfig(
        max_new_tokens=req.max_new_tokens, do_sample=False,
        eos_token_id=TOK.eos_token_id,
    )
    tokens, n_valid = gen.generate(
        FROZEN["llm"], CFG.llm, gcfg, embeds,
        jnp.asarray([len(req.input_ids)]), jax.random.PRNGKey(9),
        max_len=64, lora=TRAINABLE["lora"],
    )
    return list(np.asarray(tokens[0][: int(n_valid[0])]))


class TestBatchServer:
    def test_matches_single_shot_generate(self):
        server = BatchServer(FROZEN, TRAINABLE, CFG, TOK, max_slots=2, max_len=64)
        requests = [make_request(i, length) for i, length in enumerate([7, 5, 9, 6, 8])]
        for req in requests:
            server.submit(req)
        results = server.run_until_drained()
        assert set(results) == {0, 1, 2, 3, 4}
        for req in requests:
            expect = reference_tokens(req)
            assert results[req.request_id] == expect, (
                req.request_id, results[req.request_id], expect,
            )

    def test_request_clock_sla_summary(self):
        server = BatchServer(FROZEN, TRAINABLE, CFG, TOK, max_slots=2, max_len=64)
        for rid in range(5):
            server.submit(make_request(rid, 6, max_new=4))
        server.run_until_drained()
        sla = server.clock.summary()
        assert sla["requests"] == 5
        # queueing monotonicity: p95 TTFT ≥ p50, e2e ≥ TTFT at every quantile
        assert sla["ttft_p95_ms"] >= sla["ttft_p50_ms"] >= 0
        assert sla["e2e_p50_ms"] >= sla["ttft_p50_ms"]
        assert sla["e2e_max_ms"] >= sla["e2e_p50_ms"]
        assert sla["mean_tokens"] > 0 and sla["gen_tokens_per_s"] > 0
        # with 2 slots and 5 requests, the later admissions queue: max TTFT
        # must exceed the best-case first-wave TTFT
        assert sla["ttft_max_ms"] >= sla["ttft_p50_ms"]

    def test_mixed_feature_signatures_all_served(self):
        # pending requests with different modality SIGNATURES (a shorter
        # face feature sequence, and a text-only request) must be served
        # in separate admissions — the union-of-modalities stacking used
        # to KeyError/ValueError after the batch was dequeued, losing
        # every request in it
        server = BatchServer(FROZEN, TRAINABLE, CFG, TOK, max_slots=4, max_len=64)
        reqs = [make_request(0, 7), make_request(1, 6)]
        short = make_request(2, 7)
        short.features = {"face": short.features["face"][:5]}
        reqs.append(short)
        rng = np.random.RandomState(99)
        reqs.append(Request(
            request_id=3, input_ids=rng.randint(1, 250, 6).astype(np.int32),
            features={}, offsets={}, max_new_tokens=4,
        ))
        for r in reqs:
            server.submit(r)
        results = server.run_until_drained()
        assert set(results) == {0, 1, 2, 3}
        for r in reqs:
            assert results[r.request_id] == reference_tokens(r), r.request_id

    def test_overlong_prompt_rejected_at_submit(self):
        import pytest

        server = BatchServer(FROZEN, TRAINABLE, CFG, TOK, max_slots=2, max_len=64)
        # == max_len would silently corrupt the last cache column on the
        # first decode write; > max_len would crash _admit post-dequeue
        with pytest.raises(ValueError):
            server.submit(make_request(0, 64))
        with pytest.raises(ValueError):
            server.submit(make_request(0, 80))
        # the longest admissible prompt serves normally (max_new=1 needs
        # no decode cache write: first token comes from prefill logits)
        edge = make_request(1, 63, max_new=1)
        server.submit(edge)
        results = server.run_until_drained()
        assert results[1] == reference_tokens(edge)

    def test_admission_sizes_share_bucketed_programs(self):
        # admissions of size 1..max_slots must reuse power-of-two-bucketed
        # prefill programs; dummy rows scatter out of bounds (dropped) and
        # must not corrupt any live slot's cache
        server = BatchServer(FROZEN, TRAINABLE, CFG, TOK, max_slots=4, max_len=64)
        reqs = [make_request(i, 5 + i, max_new=6) for i in range(3)]  # size-3 → bucket 4
        for r in reqs:
            server.submit(r)
        server.step()  # admission of 3 (1 dummy row) + first decode
        late = make_request(7, 6, max_new=4)  # admits alone later (bucket 1)
        server.submit(late)
        results = server.run_until_drained()
        for r in reqs + [late]:
            assert results[r.request_id] == reference_tokens(r), r.request_id

    def test_slot_reuse_across_waves(self):
        server = BatchServer(FROZEN, TRAINABLE, CFG, TOK, max_slots=2, max_len=64)
        for rid in range(3):
            server.submit(make_request(rid, 5, max_new=3))
        server.run_until_drained()
        # second wave reuses slots whose caches held earlier requests
        server.submit(make_request(10, 7, max_new=4))
        results = server.run_until_drained()
        assert 10 in results
        assert results[10] == reference_tokens(make_request(10, 7, max_new=4))
