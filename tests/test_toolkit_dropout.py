"""Train-mode dropout for the toolkit fusion baselines.

The reference's MERBench models all regularize with args.dropout
(toolkit/models/*.py: MLPEncoder/LSTMEncoder dropout, post_fusion_dropout,
per-timestep memory-loop dropouts) and train under model.train().
Contract here: dropout applies ONLY when apply() receives train_rng
(evaluation and all pre-existing callers pass nothing = torch eval mode,
bitwise-identical outputs)."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affectgpt_tpu.toolkit.models import FUSION_MODELS, FusionArgs

ARGS = FusionArgs.tiny()
FRAME_MODELS = {"ef_lstm", "mfn", "graph_mfn", "mctn"}


def make_batch(b=4, frame=False, t=5):
    rng = np.random.RandomState(0)
    if frame:
        return {
            "audios": jnp.asarray(rng.randn(b, t, ARGS.audio_dim), jnp.float32),
            "texts": jnp.asarray(rng.randn(b, t, ARGS.text_dim), jnp.float32),
            "videos": jnp.asarray(rng.randn(b, t, ARGS.video_dim), jnp.float32),
        }
    return {
        "audios": jnp.asarray(rng.randn(b, ARGS.audio_dim), jnp.float32),
        "texts": jnp.asarray(rng.randn(b, ARGS.text_dim), jnp.float32),
        "videos": jnp.asarray(rng.randn(b, ARGS.video_dim), jnp.float32),
    }


@pytest.mark.parametrize("name", sorted(FUSION_MODELS))
def test_eval_mode_identity(name):
    """No train_rng == rate-zero train_rng == the pre-existing forward."""
    model = FUSION_MODELS[name]
    batch = make_batch(frame=name in FRAME_MODELS)
    params = model.init(jax.random.PRNGKey(0), ARGS)  # ARGS.dropout == 0
    args_hi = replace(ARGS, dropout=0.5)

    _, emos_plain, _, _ = model.apply(params, ARGS, batch)
    _, emos_none, _, _ = model.apply(params, args_hi, batch, train_rng=None)
    _, emos_rate0, _, _ = model.apply(
        params, ARGS, batch, train_rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(emos_plain), np.asarray(emos_none))
    np.testing.assert_array_equal(np.asarray(emos_plain), np.asarray(emos_rate0))


@pytest.mark.parametrize("name", sorted(FUSION_MODELS))
def test_train_mode_perturbs_deterministically(name):
    model = FUSION_MODELS[name]
    batch = make_batch(frame=name in FRAME_MODELS)
    args = replace(ARGS, dropout=0.5)
    params = model.init(jax.random.PRNGKey(0), args)

    _, emos_eval, _, _ = model.apply(params, args, batch)
    _, e_a1, _, _ = model.apply(params, args, batch, train_rng=jax.random.PRNGKey(2))
    _, e_a2, _, _ = model.apply(params, args, batch, train_rng=jax.random.PRNGKey(2))
    _, e_b, _, _ = model.apply(params, args, batch, train_rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(e_a1), np.asarray(e_a2))
    assert not np.array_equal(np.asarray(e_a1), np.asarray(emos_eval))
    assert not np.array_equal(np.asarray(e_a1), np.asarray(e_b))
    assert np.isfinite(np.asarray(e_a1)).all()


def test_trainer_with_dropout_learns():
    """train_fusion_model with args.dropout > 0 still learns the synthetic
    signal, and evaluation (eval-mode) is deterministic."""
    from tests.test_toolkit_train import make_tables

    from affectgpt_tpu.toolkit.train import evaluate_fusion_model, train_fusion_model

    args, table = make_tables()
    args = replace(args, dropout=0.3)
    params, history = train_fusion_model(
        "attention", args, table, test=table, epochs=12, batch_size=16, lr=5e-3
    )
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    m1 = evaluate_fusion_model("attention", args, params, table)
    m2 = evaluate_fusion_model("attention", args, params, table)
    assert m1 == m2  # eval path never sees a dropout rng
    assert m1["emo_accuracy"] > 0.5


def test_trainer_dropout_changes_training():
    """Same seed/data: dropout on vs off must diverge the training loss
    trajectory (proves the rng actually reaches the jitted step)."""
    from tests.test_toolkit_train import make_tables

    from affectgpt_tpu.toolkit.train import train_fusion_model

    args, table = make_tables(n=32)
    _, hist_off = train_fusion_model("lf_dnn", args, table, epochs=2, batch_size=16)
    _, hist_on = train_fusion_model(
        "lf_dnn", replace(args, dropout=0.5), table, epochs=2, batch_size=16)
    assert hist_on[0]["train_loss"] != hist_off[0]["train_loss"]


def test_trainer_grad_clip():
    """args.grad_clip > 0 clips the global grad norm (MERBench -1-disables
    convention; the reference models store it for their trainer,
    attention.py:19). A clipped run must still learn and differ from the
    unclipped trajectory at a tiny max norm."""
    from tests.test_toolkit_train import make_tables

    from affectgpt_tpu.toolkit.train import train_fusion_model

    args, table = make_tables(n=32)
    _, hist_off = train_fusion_model("attention", args, table, epochs=2, batch_size=16)
    _, hist_clip = train_fusion_model(
        "attention", replace(args, grad_clip=1e-3), table, epochs=2, batch_size=16)
    assert hist_clip[-1]["train_loss"] != hist_off[-1]["train_loss"]
    assert np.isfinite(hist_clip[-1]["train_loss"])


def test_e2e_dropout():
    from affectgpt_tpu.toolkit import e2e

    cfg = e2e.E2EConfig(dropout=0.5, hidden_dim=8, text_dim=12)
    params = e2e.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    sz = cfg.vision.image_size
    batch = {
        "frames": jnp.asarray(rng.randn(2, 2, sz, sz, 3), jnp.float32),
        "audios": jnp.asarray(rng.randn(2, 2, 1, 800), jnp.float32),
        "texts": jnp.asarray(rng.randn(2, cfg.text_dim), jnp.float32),
    }
    _, emos_eval, _, _ = e2e.apply(params, cfg, batch)
    _, emos_a, _, _ = e2e.apply(params, cfg, batch, train_rng=jax.random.PRNGKey(1))
    _, emos_a2, _, _ = e2e.apply(params, cfg, batch, train_rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(emos_a), np.asarray(emos_a2))
    assert not np.array_equal(np.asarray(emos_a), np.asarray(emos_eval))
