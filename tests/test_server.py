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
