"""Train-mode LoRA dropout: peft semantics (reference builds every LLM
with LoraConfig(lora_dropout=0.05), my_affectgpt/models/affectgpt.py:123,
and trains under model.train(), runner_base.py:461).

Contract: dropout applies ONLY when a dropout_rng is passed (inference
and every parity oracle pass None = torch eval mode); the mask hits the
LoRA-branch input only (the frozen base matmul is untouched); inverted
scaling keeps the branch unbiased."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from affectgpt_tpu.models import affectgpt, qwen2
from affectgpt_tpu.training import train_step as ts


CFG = affectgpt.AffectGPTConfig.tiny()  # llm.lora_dropout = 0.05 default
FROZEN = affectgpt.init_frozen(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
TRAINABLE = affectgpt.init_trainable(jax.random.PRNGKey(1), CFG)
# standard LoRA init has B=0 (branch output identically zero), which would
# make input dropout a loss no-op — randomize B so the branch is live
import zlib

TRAINABLE["lora"] = jax.tree_util.tree_map_with_path(
    lambda path, leaf: (
        jax.random.normal(
            jax.random.PRNGKey(zlib.crc32(str(path).encode()) % (2**31)), leaf.shape
        ).astype(leaf.dtype)
        if path[-1].key == "b"
        else leaf
    ),
    TRAINABLE["lora"],
)


def _batch(b=2, t=12):
    rng = np.random.RandomState(0)
    ids = rng.randint(1, CFG.llm.vocab_size, (b, t)).astype(np.int32)
    labels = ids.copy()
    labels[:, : t // 2] = -100
    feats = {
        "frame": jnp.asarray(rng.randn(b, 4, CFG.visual_dim), jnp.float32),
        "audio": jnp.asarray(rng.randn(b, 4, CFG.acoustic_dim), jnp.float32),
    }
    offs = {"frame": jnp.full((b,), 1, jnp.int32), "audio": jnp.full((b,), 4, jnp.int32)}
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, t), jnp.int32),
        "labels": jnp.asarray(labels),
        "features": feats,
        "offsets": offs,
    }


class TestLoraDropout:
    def test_no_rng_is_eval_mode(self):
        """dropout_rng=None must be the exact pre-existing eval forward —
        equal to running with the rate zeroed out."""
        batch = _batch()
        cfg0 = dataclasses.replace(
            CFG, llm=dataclasses.replace(CFG.llm, lora_dropout=0.0)
        )
        l_none = affectgpt.forward_loss(FROZEN, TRAINABLE, CFG, batch)
        l_zero = affectgpt.forward_loss(
            FROZEN, TRAINABLE, cfg0, batch, dropout_rng=jax.random.PRNGKey(3)
        )
        np.testing.assert_array_equal(np.asarray(l_none), np.asarray(l_zero))

    def test_train_mode_changes_loss_deterministically(self):
        batch = _batch()
        l_eval = float(affectgpt.forward_loss(FROZEN, TRAINABLE, CFG, batch))
        cfg_hi = dataclasses.replace(
            CFG, llm=dataclasses.replace(CFG.llm, lora_dropout=0.5)
        )
        l_a1 = float(affectgpt.forward_loss(
            FROZEN, TRAINABLE, cfg_hi, batch, dropout_rng=jax.random.PRNGKey(7)))
        l_a2 = float(affectgpt.forward_loss(
            FROZEN, TRAINABLE, cfg_hi, batch, dropout_rng=jax.random.PRNGKey(7)))
        l_b = float(affectgpt.forward_loss(
            FROZEN, TRAINABLE, cfg_hi, batch, dropout_rng=jax.random.PRNGKey(8)))
        assert l_a1 == l_a2  # same key -> same mask
        assert l_a1 != l_b or l_a1 != l_eval  # dropout actually perturbs

    def test_inverted_scaling_unbiased(self):
        """E[dropout-branch output] == no-dropout branch output (peft's
        nn.Dropout inverted scaling). Base weight zeroed to isolate the
        LoRA branch."""
        rng = np.random.RandomState(1)
        in_dim, out_dim, r = 16, 8, 4
        base = {"w": jnp.zeros((in_dim, out_dim), jnp.float32)}
        lora = {
            "a": jnp.asarray(rng.randn(in_dim, r), jnp.float32),
            "b": jnp.asarray(rng.randn(r, out_dim), jnp.float32),
        }
        x = jnp.asarray(rng.randn(3, in_dim), jnp.float32)
        ref = qwen2._lora_dense(base, lora, x, scaling=1.0, has_bias=False)
        keys = jax.random.split(jax.random.PRNGKey(0), 8192)
        outs = jax.vmap(
            lambda k: qwen2._lora_dense(
                base, lora, x, scaling=1.0, has_bias=False, drop=(k, 0.5)
            )
        )(keys)
        # per-element std ~ sqrt(sum_i x_i^2 w_ij^2) ~ 8 here; mean of 8192
        # draws has std ~0.09 — 0.5 is a >5 sigma band
        np.testing.assert_allclose(
            np.mean(np.asarray(outs), axis=0), np.asarray(ref), atol=0.5
        )
        # and any single draw differs from the no-drop output
        assert not np.allclose(np.asarray(outs[0]), np.asarray(ref))

    def test_projections_get_independent_masks(self):
        d_q = qwen2._lora_drop(jax.random.PRNGKey(5), CFG.llm, "q_proj")
        d_k = qwen2._lora_drop(jax.random.PRNGKey(5), CFG.llm, "k_proj")
        m_q = jax.random.bernoulli(d_q[0], 0.5, (64,))
        m_k = jax.random.bernoulli(d_k[0], 0.5, (64,))
        assert not np.array_equal(np.asarray(m_q), np.asarray(m_k))
        assert qwen2._lora_drop(None, CFG.llm, "q_proj") is None
        cfg0 = dataclasses.replace(CFG.llm, lora_dropout=0.0)
        assert qwen2._lora_drop(jax.random.PRNGKey(5), cfg0, "q_proj") is None

    def test_train_step_seed_gates_dropout(self):
        """make_train_step(dropout_seed=None) reproduces the eval loss;
        a seed changes it; the seeded step stays differentiable."""
        batch = _batch()
        tx = optax.sgd(1e-3)
        state = ts.create_train_state(TRAINABLE, tx)
        step_eval = ts.make_train_step(CFG, tx, dropout_seed=None)
        step_drop = ts.make_train_step(CFG, tx, dropout_seed=123)
        _, m_eval = step_eval(state, FROZEN, batch)
        l_fwd = float(affectgpt.forward_loss(FROZEN, TRAINABLE, CFG, batch))
        assert abs(float(m_eval["loss"]) - l_fwd) < 1e-6
        state2 = ts.create_train_state(TRAINABLE, tx)
        new_state, m_drop = step_drop(state2, FROZEN, batch)
        assert np.isfinite(float(m_drop["loss"]))
        assert float(m_drop["loss"]) != l_fwd
        assert np.isfinite(float(m_drop["grad_norm"]))
        # next step folds a different key: same batch, different mask
        _, m_drop2 = step_drop(new_state, FROZEN, batch)
        assert float(m_drop2["loss"]) != float(m_drop["loss"])


class TestQFormerDropout:
    """BERT dropouts on the trainable merger Q-Formers (the reference
    inherits hidden/attention dropout 0.1 from bert-base-uncased,
    blip2.py:53-60, active under model.train())."""

    def _qf(self):
        from affectgpt_tpu.models import qformer

        cfg = qformer.QFormerConfig.tiny()
        params = qformer.init_params(jax.random.PRNGKey(0), cfg)
        enc = jnp.asarray(np.random.RandomState(0).randn(2, 6, cfg.encoder_width), jnp.float32)
        return qformer, cfg, params, enc

    def test_no_rng_is_eval_mode(self):
        qformer, cfg, params, enc = self._qf()
        cfg0 = dataclasses.replace(
            cfg, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0
        )
        out_none = qformer.apply(params, cfg, enc)
        out_zero = qformer.apply(params, cfg0, enc, dropout_rng=jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(out_none), np.asarray(out_zero))

    def test_train_mode_perturbs_deterministically(self):
        qformer, cfg, params, enc = self._qf()
        o_eval = np.asarray(qformer.apply(params, cfg, enc))
        o_a1 = np.asarray(qformer.apply(params, cfg, enc, dropout_rng=jax.random.PRNGKey(2)))
        o_a2 = np.asarray(qformer.apply(params, cfg, enc, dropout_rng=jax.random.PRNGKey(2)))
        o_b = np.asarray(qformer.apply(params, cfg, enc, dropout_rng=jax.random.PRNGKey(3)))
        np.testing.assert_array_equal(o_a1, o_a2)
        assert not np.array_equal(o_a1, o_eval)
        assert not np.array_equal(o_a1, o_b)

    def test_resume_reproduces_mask_sequence(self):
        """fold_in(seed, state.step) makes dropout resume-stable: running
        4 steps straight must equal 2 steps + (checkpoint-style) restore +
        2 steps bitwise — the restored state.step re-derives the exact
        per-step keys."""
        batch = _batch()
        tx = optax.sgd(1e-3)
        step = ts.make_train_step(CFG, tx, dropout_seed=11)

        s_straight = ts.create_train_state(TRAINABLE, tx)
        for _ in range(4):
            s_straight, m_straight = step(s_straight, FROZEN, batch)

        s_resumed = ts.create_train_state(TRAINABLE, tx)
        for _ in range(2):
            s_resumed, _ = step(s_resumed, FROZEN, batch)
        # checkpoint round trip: host copy of the full state
        payload = jax.tree.map(np.asarray, s_resumed)
        s_resumed = jax.tree.map(jnp.asarray, payload)
        for _ in range(2):
            s_resumed, m_resumed = step(s_resumed, FROZEN, batch)

        np.testing.assert_array_equal(
            np.asarray(m_straight["loss"]), np.asarray(m_resumed["loss"]))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            s_straight.trainable, s_resumed.trainable,
        )

    def test_bert_dropout_independent_of_lora_rate(self):
        """model.train() semantics: lora_dropout: 0 must disable ONLY the
        LoRA site — the trainable merger Q-Formers' BERT dropouts stay
        active (the runner passes dropout_seed unconditionally)."""
        cfg = dataclasses.replace(
            affectgpt.AffectGPTConfig.tiny(),
            video_fusion_type="qformer", audio_fusion_type="qformer",
        )
        cfg = dataclasses.replace(cfg, llm=dataclasses.replace(cfg.llm, lora_dropout=0.0))
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)
        batch = _batch()
        tx = optax.sgd(1e-3)
        state = ts.create_train_state(trainable, tx)
        l_eval = float(affectgpt.forward_loss(frozen, trainable, cfg, batch))
        _, m = ts.make_train_step(cfg, tx, dropout_seed=7)(state, frozen, batch)
        assert float(m["loss"]) != l_eval  # qformer dropout alive at lora rate 0

    def test_merger_path_threading(self):
        """forward_loss must route the rng into qformer-fusion mergers:
        with the default zero-B LoRA (branch inert), a dropout_rng still
        changes the loss iff the merger dropout is wired through."""
        cfg = dataclasses.replace(
            affectgpt.AffectGPTConfig.tiny(),
            video_fusion_type="qformer", audio_fusion_type="qformer",
        )
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg)  # lora B = 0
        batch = _batch()
        l_eval = float(affectgpt.forward_loss(frozen, trainable, cfg, batch))
        l_drop = float(affectgpt.forward_loss(
            frozen, trainable, cfg, batch, dropout_rng=jax.random.PRNGKey(4)))
        assert l_drop != l_eval


class TestDropoutCustomVJP:
    """AFFECTGPT_DROPOUT_VJP=1 (qwen2._lora_drop_branch): the custom VJP
    regenerates dropout masks from the key in backward instead of carrying
    mask/dropped-copy/A-activation residuals through remat. Forward must be
    bit-identical to the plain path (same ops, same key); gradients must
    match autodiff for EVERY trainable leaf."""

    def _loss_and_grads(self, remat, dropout_rng):
        def loss_fn(trainable):
            return affectgpt.forward_loss(
                FROZEN, trainable, CFG, _batch(), remat=remat,
                dropout_rng=dropout_rng,
            )

        return jax.value_and_grad(loss_fn)(TRAINABLE)

    @pytest.mark.parametrize("remat", [False, True])
    @pytest.mark.parametrize("impl", ["threefry2x32", "rbg"])
    def test_forward_and_grad_parity(self, monkeypatch, remat, impl):
        rng = jax.random.key(11, impl=impl)
        monkeypatch.setenv("AFFECTGPT_DROPOUT_VJP", "0")
        l_ref, g_ref = self._loss_and_grads(remat, rng)
        monkeypatch.setenv("AFFECTGPT_DROPOUT_VJP", "1")
        l_vjp, g_vjp = self._loss_and_grads(remat, rng)
        np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_vjp))
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_vjp = jax.tree.leaves(g_vjp)
        assert len(flat_ref) == len(flat_vjp)
        for (path, ref), vjp in zip(flat_ref, flat_vjp):
            np.testing.assert_allclose(
                np.asarray(ref), np.asarray(vjp), rtol=1e-5, atol=1e-6,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_vjp_path_actually_dispatches(self, monkeypatch):
        """The knob must flip the traced graph: count _lora_drop_branch
        calls via a spy."""
        calls = []
        orig = qwen2._lora_drop_branch

        monkeypatch.setenv("AFFECTGPT_DROPOUT_VJP", "1")
        monkeypatch.setattr(
            qwen2, "_lora_drop_branch",
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1],
        )
        affectgpt.forward_loss(
            FROZEN, TRAINABLE, CFG, _batch(), dropout_rng=jax.random.PRNGKey(5)
        )
        assert calls  # dispatched through the custom branch
        calls.clear()
        monkeypatch.setenv("AFFECTGPT_DROPOUT_VJP", "0")
        affectgpt.forward_loss(
            FROZEN, TRAINABLE, CFG, _batch(), dropout_rng=jax.random.PRNGKey(5)
        )
        assert not calls
