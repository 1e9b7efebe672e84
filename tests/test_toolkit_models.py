"""Toolkit fusion baseline tests: all models produce the 4-tuple contract
and train a step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from affectgpt_tpu.toolkit.models import FUSION_MODELS, FusionArgs

ARGS = FusionArgs.tiny()


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


@pytest.mark.parametrize("name", sorted(set(FUSION_MODELS) - {"ef_lstm", "mfn", "graph_mfn", "mctn"}))
def test_fusion_contract(name):
    model = FUSION_MODELS[name]
    params = model.init(jax.random.PRNGKey(0), ARGS)
    feats, emos, vals, interloss = model.apply(params, ARGS, make_batch())
    assert emos.shape == (4, ARGS.output_dim1)
    assert vals.shape == (4, ARGS.output_dim2)
    assert np.isfinite(np.asarray(emos)).all()
    assert float(interloss) >= 0


def test_ef_lstm_frame_input():
    model = FUSION_MODELS["ef_lstm"]
    params = model.init(jax.random.PRNGKey(0), ARGS)
    feats, emos, vals, _ = model.apply(params, ARGS, make_batch(frame=True))
    assert emos.shape == (4, ARGS.output_dim1)


def test_lstm_feat_type_models():
    args = FusionArgs(
        text_dim=12, audio_dim=10, video_dim=8, hidden_dim=16,
        output_dim1=4, feat_type="frm_align", num_heads=2, num_layers=1,
    )
    model = FUSION_MODELS["attention"]
    params = model.init(jax.random.PRNGKey(0), args)
    _, emos, _, _ = model.apply(params, args, make_batch(frame=True))
    assert emos.shape == (4, 4)


def test_fusion_trains():
    model = FUSION_MODELS["lmf"]
    params = model.init(jax.random.PRNGKey(0), ARGS)
    batch = make_batch()
    labels = jnp.asarray(np.random.RandomState(1).randint(0, ARGS.output_dim1, (4,)))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            _, emos, _, inter = model.apply(p, ARGS, batch)
            ce = optax.softmax_cross_entropy_with_integer_labels(emos, labels).mean()
            return ce + inter

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_mfn_frame_input():
    from affectgpt_tpu.toolkit.models import FUSION_MODELS
    model = FUSION_MODELS["mfn"]
    params = model.init(jax.random.PRNGKey(0), ARGS)
    feats, emos, vals, _ = model.apply(params, ARGS, make_batch(frame=True))
    assert emos.shape == (4, ARGS.output_dim1)
    assert np.isfinite(np.asarray(feats)).all()


@pytest.mark.parametrize("name", ["graph_mfn", "mctn"])
def test_sequence_fusion_models(name):
    from affectgpt_tpu.toolkit.models import FUSION_MODELS
    model = FUSION_MODELS[name]
    params = model.init(jax.random.PRNGKey(0), ARGS)
    feats, emos, vals, inter = model.apply(params, ARGS, make_batch(frame=True))
    assert emos.shape == (4, ARGS.output_dim1)
    assert float(inter) >= 0
    assert np.isfinite(np.asarray(feats)).all()


def test_attention_topn_nstream():
    """N-stream Attention_TOPN: 5 streams of differing dims via feat{i} keys
    (reference attention_topn.py feeds batch['feat0']..['featN'])."""
    from dataclasses import replace
    from affectgpt_tpu.toolkit.models import FUSION_MODELS

    dims = (10, 12, 8, 6, 14)
    args = replace(ARGS, feat_dims=dims)
    model = FUSION_MODELS["attention_topn"]
    params = model.init(jax.random.PRNGKey(0), args)
    assert len(params["encoders"]) == 5

    rng = np.random.RandomState(1)
    batch = {f"feat{i}": jnp.asarray(rng.randn(4, d), jnp.float32)
             for i, d in enumerate(dims)}
    feats, emos, vals, inter = jax.jit(
        lambda p, b: model.apply(p, args, b))(params, batch)
    assert feats.shape == (4, args.hidden_dim)
    assert emos.shape == (4, args.output_dim1)
    assert np.isfinite(np.asarray(emos)).all()

    # gradients reach every per-stream encoder
    def loss(p):
        _, e, _, _ = model.apply(p, args, batch)
        return jnp.sum(e ** 2)

    grads = jax.grad(loss)(params)
    for g in grads["encoders"]:
        assert float(jnp.abs(g["fc1"]["w"]).sum()) > 0


def test_attention_topn_cap():
    from dataclasses import replace
    from affectgpt_tpu.toolkit.models import FUSION_MODELS
    with pytest.raises(AssertionError):
        FUSION_MODELS["attention_topn"].init(
            jax.random.PRNGKey(0), replace(ARGS, feat_dims=(4,) * 19))
