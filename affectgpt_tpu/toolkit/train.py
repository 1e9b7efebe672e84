"""Trainer for the traditional fusion baselines on precomputed features.

Capability-parity with the reference toolkit training loop (reference:
toolkit/ main train scripts + dataloader/: utterance-level feature npys
per modality + label npz, cross-entropy + MSE multi-task loss, combined
metric checkpoint selection). One jit step; whole-dataset batches stream
from host numpy.

Feature layout: {feature_root}/{audio_feat}/{name}.npy etc. (the
MERBench feature-directory convention).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from affectgpt_tpu.toolkit.metrics import combined_metric, emotion_metrics, valence_metrics
from affectgpt_tpu.toolkit.models import FUSION_MODELS, FusionArgs
from affectgpt_tpu.utils.logging import logger


@dataclass
class FeatureTable:
    names: List[str]
    audios: np.ndarray
    texts: np.ndarray
    videos: np.ndarray
    emos: Optional[np.ndarray] = None  # int labels
    vals: Optional[np.ndarray] = None  # float valence


def _load_feature_map(feature_root: str, source: str) -> Dict[str, np.ndarray]:
    """A feature source is either a directory of {name}.npy files or a
    single name-keyed .npz pack (both MERBench distribution formats,
    reference toolkit/dataloader/*)."""
    path = os.path.join(feature_root, source)
    if os.path.isdir(path):
        return {
            os.path.splitext(f)[0]: np.load(os.path.join(path, f))
            for f in os.listdir(path) if f.endswith(".npy")
        }
    if path.endswith(".npz") and os.path.exists(path):
        pack = np.load(path, allow_pickle=True)
        if "feature" in pack and "name" in pack:  # paired-array pack
            return dict(zip(pack["name"].tolist(), pack["feature"]))
        return {key: pack[key] for key in pack.files}
    raise FileNotFoundError(path)


def load_feature_table(
    feature_root: str, audio_dir: str, text_dir: str, video_dir: str,
    name2emo: Optional[Dict[str, int]] = None, name2val: Optional[Dict[str, float]] = None,
) -> FeatureTable:
    maps = [
        _load_feature_map(feature_root, src) for src in (audio_dir, text_dir, video_dir)
    ]
    names = sorted(set(maps[0]) & set(maps[1]) & set(maps[2]))

    def stack(feature_map):
        feats = [np.asarray(feature_map[n]) for n in names]
        feats = [f.mean(0) if f.ndim > 1 else f for f in feats]  # utterance-level
        return np.stack(feats).astype(np.float32)

    return FeatureTable(
        names=names,
        audios=stack(maps[0]), texts=stack(maps[1]), videos=stack(maps[2]),
        emos=np.array([name2emo[n] for n in names]) if name2emo else None,
        vals=np.array([name2val[n] for n in names], np.float32) if name2val else None,
    )


def train_fusion_model(
    model_name: str,
    args: FusionArgs,
    train: FeatureTable,
    test: Optional[FeatureTable] = None,
    epochs: int = 30,
    batch_size: int = 32,
    lr: float = 1e-3,
    seed: int = 0,
):
    """Returns (params, history). Loss = CE(emotions) + MSE(valence) + aux."""
    import jax
    import jax.numpy as jnp
    import optax

    model = FUSION_MODELS[model_name]
    params = model.init(jax.random.PRNGKey(seed), args)
    # args.grad_clip: the reference models carry it for their trainer
    # (attention.py:19 etc.; MERBench convention: -1 disables, else
    # clip_grad_norm_ before the optimizer step)
    if args.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(args.grad_clip), optax.adam(lr))
    else:
        tx = optax.adam(lr)
    opt_state = tx.init(params)

    has_emo = train.emos is not None
    has_val = train.vals is not None
    # train-mode dropout: the reference trainers run model.train() with
    # args.dropout active (toolkit models read it into their nn.Dropout
    # sites); evaluation below stays eval-mode (no rng).
    drop_on = args.dropout > 0.0
    drop_base = jax.random.PRNGKey(seed ^ 0x5EED)

    @jax.jit
    def step(params, opt_state, batch, emos, vals, train_rng):
        def loss_fn(p):
            _, emo_logits, val_pred, inter = model.apply(
                p, args, batch, train_rng=train_rng if drop_on else None
            )
            loss = inter
            if has_emo:
                loss = loss + optax.softmax_cross_entropy_with_integer_labels(
                    emo_logits, emos
                ).mean()
            if has_val:
                loss = loss + jnp.mean((val_pred[:, 0] - vals) ** 2)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(train.names)
    rng = np.random.RandomState(seed)
    history = []
    global_step = 0
    for epoch in range(epochs):
        order = rng.permutation(n)
        losses = []
        for start in range(0, n, batch_size):
            idx = order[start : start + batch_size]
            batch = {
                "audios": jnp.asarray(train.audios[idx]),
                "texts": jnp.asarray(train.texts[idx]),
                "videos": jnp.asarray(train.videos[idx]),
            }
            emos = jnp.asarray(train.emos[idx]) if has_emo else jnp.zeros(len(idx), jnp.int32)
            vals = jnp.asarray(train.vals[idx]) if has_val else jnp.zeros(len(idx), jnp.float32)
            params, opt_state, loss = step(
                params, opt_state, batch, emos, vals,
                jax.random.fold_in(drop_base, global_step),
            )
            global_step += 1
            losses.append(float(loss))
        record = {"epoch": epoch, "train_loss": float(np.mean(losses))}
        if test is not None:
            record.update(evaluate_fusion_model(model_name, args, params, test))
        history.append(record)
        logger.info("%s %s", model_name, record)
    return params, history


def train_cross_corpus(
    model_name: str,
    args: FusionArgs,
    source: FeatureTable,
    target: FeatureTable,
    **train_kwargs,
):
    """Cross-corpus protocol: train on the source corpus, evaluate on the
    target corpus (reference toolkit/dataloader/crossdis cross-dataset
    loaders). Returns (params, history, target_metrics)."""
    params, history = train_fusion_model(
        model_name, args, source, test=None, **train_kwargs
    )
    target_metrics = evaluate_fusion_model(model_name, args, params, target)
    logger.info("cross-corpus %s → target: %s", model_name, target_metrics)
    return params, history, target_metrics


def evaluate_fusion_model(model_name: str, args: FusionArgs, params, table: FeatureTable):
    import jax.numpy as jnp

    model = FUSION_MODELS[model_name]
    batch = {
        "audios": jnp.asarray(table.audios),
        "texts": jnp.asarray(table.texts),
        "videos": jnp.asarray(table.videos),
    }
    _, emo_logits, val_pred, _ = model.apply(params, args, batch)
    out: Dict[str, float] = {}
    if table.emos is not None:
        out.update(emotion_metrics(table.emos, np.asarray(emo_logits)))
    if table.vals is not None:
        out.update(valence_metrics(table.vals, np.asarray(val_pred)))
    if "emo_waf1" in out:
        out["combined"] = combined_metric(out["emo_waf1"], out.get("val_mse", 0.0))
    return out
