"""Toolkit trainer test: synthetic feature table → training improves the
combined metric; evaluation contract."""

import numpy as np

from affectgpt_tpu.toolkit.models import FusionArgs
from affectgpt_tpu.toolkit.train import (
    FeatureTable,
    evaluate_fusion_model,
    train_fusion_model,
)


def make_tables(n=64, seed=0):
    rng = np.random.RandomState(seed)
    args = FusionArgs.tiny()
    emos = rng.randint(0, args.output_dim1, n)
    # features carry the label signal in the audio stream
    audios = rng.randn(n, args.audio_dim).astype(np.float32)
    audios[:, 0] = emos * 1.0
    vals = (emos - args.output_dim1 / 2).astype(np.float32) / args.output_dim1
    table = FeatureTable(
        names=[f"s{i}" for i in range(n)],
        audios=audios,
        texts=rng.randn(n, args.text_dim).astype(np.float32),
        videos=rng.randn(n, args.video_dim).astype(np.float32),
        emos=emos,
        vals=vals,
    )
    return args, table


def test_train_improves_metrics():
    args, table = make_tables()
    params, history = train_fusion_model(
        "attention", args, table, test=table, epochs=12, batch_size=16, lr=5e-3
    )
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    final = evaluate_fusion_model("attention", args, params, table)
    assert final["emo_accuracy"] > 0.5  # learnable synthetic signal
    assert "combined" in final and "val_mse" in final


def test_cross_corpus_protocol():
    from affectgpt_tpu.toolkit.train import train_cross_corpus

    args, source = make_tables(n=48, seed=0)
    _, target = make_tables(n=24, seed=7)
    params, history, metrics = train_cross_corpus(
        "lf_dnn", args, source, target, epochs=6, batch_size=16, lr=5e-3
    )
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    assert "emo_accuracy" in metrics and 0.0 <= metrics["emo_accuracy"] <= 1.0


def test_cross_dimension_protocol():
    """crossdim parity (reference toolkit/dataloader/crossdim.py): train
    valence-only on the source corpus, evaluate regression on the target —
    expressed as cross-corpus with emos=None tables."""
    from affectgpt_tpu.toolkit.train import train_cross_corpus

    args, source = make_tables(n=48, seed=1)
    _, target = make_tables(n=24, seed=8)
    source.emos = None
    target.emos = None
    params, history, metrics = train_cross_corpus(
        "attention", args, source, target, epochs=6, batch_size=16, lr=5e-3
    )
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    assert "val_mse" in metrics and "emo_accuracy" not in metrics
