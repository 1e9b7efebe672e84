"""Traditional feature-level fusion baselines (MERBench toolkit).

Capability-parity with the reference toolkit model zoo (reference:
toolkit/models/*.py — attention.py, tfn.py, lmf.py, lf_dnn.py,
ef_lstm.py, mult.py, misa.py, ...). Each model consumes utterance-level
(or frame-level) audio/text/video features and produces
(features, emotion logits, valence, aux loss) — the four-tuple contract
of the reference trainers.

Implemented TPU-natively as functional param pytrees; the LSTM encoder
is a lax.scan, fusion tensor products are einsums on the MXU. Models:
Attention, TFN, LMF, LF_DNN, EF_LSTM, MULT (crossmodal-transformer
core), MISA (modality-invariant/-specific spaces with CMD/diff/recon
auxiliary losses, simplified recon).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from affectgpt_tpu import registry
from affectgpt_tpu.models import nn


@dataclass(frozen=True)
class FusionArgs:
    text_dim: int = 768
    audio_dim: int = 512
    video_dim: int = 512
    hidden_dim: int = 128
    output_dim1: int = 6  # discrete emotions
    output_dim2: int = 1  # valence
    rank: int = 4  # LMF rank
    num_heads: int = 4  # MULT heads
    num_layers: int = 2  # MULT layers
    # args.dropout — every reference baseline regularizes with it
    # (toolkit/models/*.py read args.dropout into their MLPEncoder/
    # LSTMEncoder/nn.Dropout sites). Train-mode only: active iff apply()
    # receives train_rng; evaluation always runs eval-mode identity.
    dropout: float = 0.0
    # args.grad_clip — every reference baseline stores it for its trainer
    # (e.g. attention.py:19); MERBench convention: -1 disables, otherwise
    # clip_grad_norm_ with this max norm.
    grad_clip: float = -1.0
    feat_type: str = "utt"  # utt | frm_align | frm_unalign
    # Attention_TOPN stream dims (reference stores the list in args.audio_dim,
    # attention_topn.py:13); empty → the standard (audio, text, video) triple.
    feat_dims: Tuple[int, ...] = ()

    @classmethod
    def tiny(cls):
        return cls(text_dim=12, audio_dim=10, video_dim=8, hidden_dim=16,
                   output_dim1=4, output_dim2=1, rank=2, num_heads=2, num_layers=1)


# -- shared encoders -----------------------------------------------------------


def _drop(key, rate: float, x):
    """Inverted train-mode dropout (torch nn.Dropout under model.train());
    identity when key is None or rate == 0 — bitwise the pre-existing
    eval forward."""
    if key is None or rate <= 0.0:
        return x
    return nn.dropout(key, rate, x)


def _site(key, i: int):
    """Stable per-site subkey; None propagates (eval mode)."""
    return None if key is None else jax.random.fold_in(key, i)


def _dr(train_rng, args: FusionArgs, i: int):
    """(key, rate) drop handle for site i, or None when dropout is off."""
    if train_rng is None or args.dropout <= 0.0:
        return None
    return (jax.random.fold_in(train_rng, i), args.dropout)


def mlp_encoder_init(rng, in_dim, hidden, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": nn.dense_init(k1, in_dim, hidden, dtype=dtype),
        "fc2": nn.dense_init(k2, hidden, hidden, dtype=dtype),
    }


def mlp_encoder(params, x, drop=None):
    """drop: optional (key, rate) train-mode switch. The reference's
    MLPEncoder(in, hidden, dropout) module file is not vendored
    (toolkit/models/modules/ is absent from the reference tree), but every
    caller constructs it with args.dropout: applied after each activation
    here — placement around ReLU is exactly equivalent (dropout commutes
    with ReLU: relu(c·x) = c·relu(x) for c ≥ 0 and relu(0) = 0)."""
    key, rate = drop if drop is not None else (None, 0.0)
    h = _drop(_site(key, 0), rate, jax.nn.relu(nn.dense(params["fc1"], x)))
    return _drop(_site(key, 1), rate, jax.nn.relu(nn.dense(params["fc2"], h)))


def lstm_encoder_init(rng, in_dim, hidden, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    return {
        "wx": nn.dense_init(k1, in_dim, 4 * hidden, dtype=dtype),
        "wh": nn.dense_nobias_init(k2, hidden, 4 * hidden, dtype=dtype),
    }


def lstm_encoder(params, x, drop=None):
    """[b, t, d] → last hidden [b, h] via lax.scan.

    drop: optional (key, rate) — applied to the returned hidden (the
    reference LSTMEncoder's output dropout; same contract as mctn.py:31's
    `self.dropout(enc_state[0].squeeze())`). torch's intra-LSTM dropout
    only acts between stacked layers, so a single-layer scan is exact."""
    b = x.shape[0]
    hidden = params["wh"]["w"].shape[0]

    def step(carry, xt):
        h, c = carry
        gates = nn.dense(params["wx"], xt) + nn.dense_nobias(params["wh"], h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), None

    init = (jnp.zeros((b, hidden), x.dtype), jnp.zeros((b, hidden), x.dtype))
    (h, _), _ = jax.lax.scan(step, init, jnp.swapaxes(x, 0, 1))
    if drop is not None:
        h = _drop(drop[0], drop[1], h)
    return h


def _encoders_init(rng, args: FusionArgs, dtype=jnp.float32):
    init = mlp_encoder_init if args.feat_type == "utt" else lstm_encoder_init
    ka, kt, kv = jax.random.split(rng, 3)
    return {
        "audio": init(ka, args.audio_dim, args.hidden_dim, dtype),
        "text": init(kt, args.text_dim, args.hidden_dim, dtype),
        "video": init(kv, args.video_dim, args.hidden_dim, dtype),
    }


def _encode_all(params, args: FusionArgs, batch, rng=None):
    """rng: train-mode key — each modality encoder gets an independent
    dropout stream (the reference builds three separate encoder modules,
    each with its own nn.Dropout instances)."""
    enc = mlp_encoder if args.feat_type == "utt" else lstm_encoder
    if args.dropout <= 0.0:
        rng = None

    def d(i):
        return None if rng is None else (jax.random.fold_in(rng, i), args.dropout)

    return (
        enc(params["audio"], batch["audios"], drop=d(0)),
        enc(params["text"], batch["texts"], drop=d(1)),
        enc(params["video"], batch["videos"], drop=d(2)),
    )


def _heads_init(rng, in_dim, args: FusionArgs, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    return {
        "emo": nn.dense_init(k1, in_dim, args.output_dim1, dtype=dtype),
        "val": nn.dense_init(k2, in_dim, args.output_dim2, dtype=dtype),
    }


def _heads(params, feats):
    return nn.dense(params["emo"], feats), nn.dense(params["val"], feats)


# -- Attention fusion (reference toolkit/models/attention.py) -------------------


@registry.register_model("toolkit_attention")
class AttentionFusion:
    @staticmethod
    def init(rng, args: FusionArgs):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        return {
            "encoders": _encoders_init(k1, args),
            "attention_mlp": mlp_encoder_init(k2, args.hidden_dim * 3, args.hidden_dim),
            "fc_att": nn.dense_init(k3, args.hidden_dim, 3),
            "heads": _heads_init(k4, args.hidden_dim, args),
        }

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        """train_rng: dropout in the three encoders + attention_mlp (all
        MLPEncoder(…, dropout) in the reference, attention.py:22-30)."""
        a, t, v = _encode_all(params["encoders"], args, batch, rng=_site(train_rng, 0))
        concat = jnp.concatenate([a, t, v], axis=1)
        gate = nn.dense(params["fc_att"], mlp_encoder(
            params["attention_mlp"], concat, drop=_dr(train_rng, args, 1)))  # [b,3]
        stacked = jnp.stack([a, t, v], axis=2)  # [b, h, 3]
        feats = jnp.einsum("bhm,bm->bh", stacked, gate)
        emos, vals = _heads(params["heads"], feats)
        return feats, emos, vals, jnp.zeros(())


# -- TFN: tensor fusion (reference toolkit/models/tfn.py) ------------------------


@registry.register_model("toolkit_tfn")
class TFN:
    @staticmethod
    def init(rng, args: FusionArgs):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        h1 = (args.hidden_dim + 1) ** 3
        return {
            "encoders": _encoders_init(k1, args),
            "post1": nn.dense_init(k2, h1, args.hidden_dim),
            "post2": nn.dense_init(k3, args.hidden_dim, args.hidden_dim),
            "heads": _heads_init(k4, args.hidden_dim, args),
        }

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        """train_rng: encoder dropouts + post_fusion_dropout on the outer
        product before the post layers (tfn.py:37,74 — the post layers
        themselves are bare inplace ReLUs)."""
        a, t, v = _encode_all(params["encoders"], args, batch, rng=_site(train_rng, 0))
        b = a.shape[0]
        one = jnp.ones((b, 1), a.dtype)
        a1, t1, v1 = (jnp.concatenate([one, x], axis=1) for x in (a, t, v))
        # outer product fusion [b, (h+1)^3]
        fused = jnp.einsum("bi,bj,bk->bijk", a1, t1, v1).reshape(b, -1)
        pf = _dr(train_rng, args, 1)
        if pf is not None:
            fused = _drop(pf[0], pf[1], fused)
        h = jax.nn.relu(nn.dense(params["post1"], fused))
        h = jax.nn.relu(nn.dense(params["post2"], h))
        emos, vals = _heads(params["heads"], h)
        return h, emos, vals, jnp.zeros(())


# -- LMF: low-rank multimodal fusion (reference toolkit/models/lmf.py) -----------


@registry.register_model("toolkit_lmf")
class LMF:
    @staticmethod
    def init(rng, args: FusionArgs):
        keys = jax.random.split(rng, 6)
        h1 = args.hidden_dim + 1

        def factor(k):
            return (jax.random.normal(k, (args.rank, h1, args.hidden_dim)) * 0.02)

        return {
            "encoders": _encoders_init(keys[0], args),
            "audio_factor": factor(keys[1]),
            "text_factor": factor(keys[2]),
            "video_factor": factor(keys[3]),
            "fusion_weights": (jax.random.normal(keys[4], (1, args.rank)) * 0.02),
            "fusion_bias": jnp.zeros((1, args.hidden_dim)),
            "heads": _heads_init(keys[5], args.hidden_dim, args),
        }

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        """train_rng: encoder dropouts only — the reference's LMF defines
        post_fusion_dropout (lmf.py:39) but never invokes it in forward
        (lmf.py:57-90), so none is applied here either."""
        a, t, v = _encode_all(params["encoders"], args, batch, rng=_site(train_rng, 0))
        b = a.shape[0]
        one = jnp.ones((b, 1), a.dtype)
        a1, t1, v1 = (jnp.concatenate([one, x], axis=1) for x in (a, t, v))
        fa = jnp.einsum("bi,rih->brh", a1, params["audio_factor"])
        ft = jnp.einsum("bi,rih->brh", t1, params["text_factor"])
        fv = jnp.einsum("bi,rih->brh", v1, params["video_factor"])
        zy = fa * ft * fv  # [b, rank, h]
        feats = jnp.einsum("or,brh->bh", params["fusion_weights"], zy) + params["fusion_bias"]
        emos, vals = _heads(params["heads"], feats)
        return feats, emos, vals, jnp.zeros(())


# -- LF-DNN: late fusion DNN (reference toolkit/models/lf_dnn.py) ----------------


@registry.register_model("toolkit_lf_dnn")
class LFDNN:
    @staticmethod
    def init(rng, args: FusionArgs):
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "encoders": _encoders_init(k1, args),
            "post": mlp_encoder_init(k2, args.hidden_dim * 3, args.hidden_dim),
            "heads": _heads_init(k3, args.hidden_dim, args),
        }

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        """train_rng: encoder dropouts + post_fusion_dropout on the concat
        before the post MLP (lf_dnn.py:57; the post layers are bare
        inplace ReLUs)."""
        a, t, v = _encode_all(params["encoders"], args, batch, rng=_site(train_rng, 0))
        fused = jnp.concatenate([a, t, v], axis=1)
        pf = _dr(train_rng, args, 1)
        if pf is not None:
            fused = _drop(pf[0], pf[1], fused)
        feats = mlp_encoder(params["post"], fused)
        emos, vals = _heads(params["heads"], feats)
        return feats, emos, vals, jnp.zeros(())


# -- EF-LSTM: early fusion LSTM (reference toolkit/models/ef_lstm.py) ------------


@registry.register_model("toolkit_ef_lstm")
class EFLSTM:
    @staticmethod
    def init(rng, args: FusionArgs):
        k1, k2, k3 = jax.random.split(rng, 3)
        in_dim = args.audio_dim + args.text_dim + args.video_dim
        return {
            "lstm": lstm_encoder_init(k1, in_dim, args.hidden_dim),
            "post": mlp_encoder_init(k2, args.hidden_dim, args.hidden_dim),
            "heads": _heads_init(k3, args.hidden_dim, args),
        }

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        """train_rng: dropout on the LSTM final state and again after the
        post linear+ReLU (ef_lstm.py:49-51 applies self.dropout twice
        around the linear; torch's intra-LSTM dropout only acts between
        stacked layers, so the single-layer scan is exact)."""
        # frame-aligned inputs [b, t, d*]; early concat along features
        x = jnp.concatenate([batch["audios"], batch["texts"], batch["videos"]], axis=-1)
        h = lstm_encoder(params["lstm"], x, drop=_dr(train_rng, args, 0))
        feats = mlp_encoder(params["post"], h, drop=_dr(train_rng, args, 1))
        emos, vals = _heads(params["heads"], feats)
        return feats, emos, vals, jnp.zeros(())


# -- MULT: crossmodal transformer (reference toolkit/models/mult.py) -------------


def _xattn_block_init(rng, dim, heads, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "ln_q": nn.layernorm_init(dim, dtype),
        "ln_kv": nn.layernorm_init(dim, dtype),
        "attn": nn.mha_init(k1, dim, dim, heads, dtype=dtype),
        "ln_ffn": nn.layernorm_init(dim, dtype),
        "ffn_in": nn.dense_init(k2, dim, dim * 4, dtype=dtype),
        "ffn_out": nn.dense_init(k3, dim * 4, dim, dtype=dtype),
    }


def _xattn_block(params, q, kv, heads, drop=None):
    """drop: (key, rate) — the reference's TransformerEncoderLayer runs
    attn_dropout (on attention probs), res_dropout (on each sublayer
    output) and relu_dropout (inside the FFN), all = args.dropout
    (mult.py:85-88)."""
    key, rate = drop if drop is not None else (None, 0.0)
    h = nn.mha(params["attn"], nn.layernorm(params["ln_q"], q),
               nn.layernorm(params["ln_kv"], kv), heads,
               probs_drop=(None if key is None else (_site(key, 0), rate)))
    q = q + _drop(_site(key, 1), rate, h)
    f = jax.nn.relu(nn.dense(params["ffn_in"], nn.layernorm(params["ln_ffn"], q)))
    f = nn.dense(params["ffn_out"], _drop(_site(key, 2), rate, f))
    return q + _drop(_site(key, 3), rate, f)


@registry.register_model("toolkit_mult")
class MULT:
    """Crossmodal transformer: each target modality attends to the other two
    streams, outputs concatenated (core of reference mult.py:1-145)."""

    @staticmethod
    def init(rng, args: FusionArgs):
        keys = jax.random.split(rng, 12)
        d = args.hidden_dim
        proj = {
            "audio": nn.dense_init(keys[0], args.audio_dim, d),
            "text": nn.dense_init(keys[1], args.text_dim, d),
            "video": nn.dense_init(keys[2], args.video_dim, d),
        }
        blocks = {}
        idx = 3
        for tgt in ("audio", "text", "video"):
            for src in ("audio", "text", "video"):
                if tgt == src:
                    continue
                blocks[f"{tgt}_from_{src}"] = [
                    _xattn_block_init(jax.random.fold_in(keys[idx], l), d, args.num_heads)
                    for l in range(args.num_layers)
                ]
                idx += 1
        k_h = keys[idx]
        return {"proj": proj, "blocks": blocks, "heads": _heads_init(k_h, d * 6, args)}

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        """train_rng: embed_dropout on the projected streams, the
        per-block attn/res/relu dropouts (mult.py:85-88), and the final
        projection dropout before the heads (mult.py:136)."""
        on = train_rng is not None and args.dropout > 0.0
        streams = {
            "audio": nn.dense(params["proj"]["audio"], batch["audios"]),
            "text": nn.dense(params["proj"]["text"], batch["texts"]),
            "video": nn.dense(params["proj"]["video"], batch["videos"]),
        }
        if on:  # embed_dropout (mult.py:88)
            streams = {
                k: _drop(_site(_site(train_rng, 0), i), args.dropout, v)
                for i, (k, v) in enumerate(streams.items())
            }
        # utterance features become length-1 sequences
        streams = {k: v[:, None, :] if v.ndim == 2 else v for k, v in streams.items()}
        outs = []
        pair = 0
        for tgt in ("audio", "text", "video"):
            for src in ("audio", "text", "video"):
                if tgt == src:
                    continue
                q = streams[tgt]
                for li, block in enumerate(params["blocks"][f"{tgt}_from_{src}"]):
                    bd = None
                    if on:
                        bd = (_site(_site(train_rng, 1 + pair), li), args.dropout)
                    q = _xattn_block(block, q, streams[src], args.num_heads, drop=bd)
                outs.append(jnp.mean(q, axis=1))
                pair += 1
        feats = jnp.concatenate(outs, axis=-1)
        if on:  # final proj dropout (mult.py:136)
            feats = _drop(_site(train_rng, 7), args.dropout, feats)
        emos, vals = _heads(params["heads"], feats)
        return feats, emos, vals, jnp.zeros(())


# -- MISA: modality-invariant/-specific (reference toolkit/models/misa.py) -------


@registry.register_model("toolkit_misa")
class MISA:
    @staticmethod
    def init(rng, args: FusionArgs):
        keys = jax.random.split(rng, 9)
        d = args.hidden_dim
        return {
            "encoders": _encoders_init(keys[0], args),
            "shared": nn.dense_init(keys[1], d, d),
            "private": {
                "audio": nn.dense_init(keys[2], d, d),
                "text": nn.dense_init(keys[3], d, d),
                "video": nn.dense_init(keys[4], d, d),
            },
            "recon": nn.dense_init(keys[5], d, d),
            "fusion": mlp_encoder_init(keys[6], d * 6, d),
            "heads": _heads_init(keys[7], d, args),
        }

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        """train_rng: encoder dropouts + the fusion MLP's dropout
        (misa.py:118-124 encoders, misa.py:171 fusion_layer_1_dropout)."""
        a, t, v = _encode_all(params["encoders"], args, batch, rng=_site(train_rng, 0))
        shared = {m: jax.nn.sigmoid(nn.dense(params["shared"], x))
                  for m, x in zip(("audio", "text", "video"), (a, t, v))}
        private = {m: jax.nn.sigmoid(nn.dense(params["private"][m], x))
                   for m, x in zip(("audio", "text", "video"), (a, t, v))}
        # aux losses: similarity of shared spaces (CMD proxy: mean diff) +
        # orthogonality of private vs shared + reconstruction
        sim = sum(
            jnp.mean((shared[m1] - shared[m2]) ** 2)
            for m1, m2 in (("audio", "text"), ("audio", "video"), ("text", "video"))
        )
        diff = sum(
            jnp.mean(jnp.sum(shared[m] * private[m], axis=-1) ** 2)
            for m in ("audio", "text", "video")
        )
        recon = sum(
            jnp.mean((nn.dense(params["recon"], shared[m] + private[m]) - x) ** 2)
            for m, x in zip(("audio", "text", "video"), (a, t, v))
        )
        interloss = sim + 0.1 * diff + recon
        fused = jnp.concatenate(
            [shared["audio"], shared["text"], shared["video"],
             private["audio"], private["text"], private["video"]], axis=-1
        )
        feats = mlp_encoder(params["fusion"], fused, drop=_dr(train_rng, args, 1))
        emos, vals = _heads(params["heads"], feats)
        return feats, emos, vals, interloss


# -- MMIM: MultiModal InfoMax (reference toolkit/models/mmim.py) ------------------


@registry.register_model("toolkit_mmim")
class MMIM:
    """Hierarchical mutual-information maximization: fusion MLP plus
    CPC-style InfoNCE between the fused representation and each unimodal
    stream (the core objective of reference mmim.py; the lld/club
    estimators are folded into the bilinear InfoNCE critics)."""

    @staticmethod
    def init(rng, args: FusionArgs):
        keys = jax.random.split(rng, 6)
        d = args.hidden_dim
        return {
            "encoders": _encoders_init(keys[0], args),
            "fusion": mlp_encoder_init(keys[1], d * 3, d),
            "critic_a": nn.dense_nobias_init(keys[2], d, d),
            "critic_t": nn.dense_nobias_init(keys[3], d, d),
            "critic_v": nn.dense_nobias_init(keys[4], d, d),
            "heads": _heads_init(keys[5], d, args),
        }

    @staticmethod
    def _infonce(critic, fused, modality):
        # scores[i, j] = fused_i · W · modality_j ; positives on the diagonal
        proj = nn.dense_nobias(critic, fused)  # [b, d]
        scores = jnp.einsum("id,jd->ij", proj, modality)
        labels = jnp.arange(scores.shape[0])
        logprobs = jax.nn.log_softmax(scores, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logprobs, labels[:, None], axis=1))

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        """train_rng: encoder dropouts + fusion-MLP dropout (mmim.py:180-186
        encoders; the reference's remaining drop site lives in the CPC nets
        folded into the bilinear critics here, mmim.py:144)."""
        a, t, v = _encode_all(params["encoders"], args, batch, rng=_site(train_rng, 0))
        feats = mlp_encoder(params["fusion"], jnp.concatenate([a, t, v], axis=1),
                            drop=_dr(train_rng, args, 1))
        nce = (
            MMIM._infonce(params["critic_a"], feats, a)
            + MMIM._infonce(params["critic_t"], feats, t)
            + MMIM._infonce(params["critic_v"], feats, v)
        )
        emos, vals = _heads(params["heads"], feats)
        return feats, emos, vals, 0.1 * nce


# -- MFN: memory fusion network (reference toolkit/models/mfn.py) ----------------


@registry.register_model("toolkit_mfn")
class MFN:
    """Three synced LSTMs + delta-memory attention + gated multi-view
    memory (reference mfn.py). Frame-level inputs [b, t, d_m]."""

    @staticmethod
    def init(rng, args: FusionArgs):
        keys = jax.random.split(rng, 8)
        d = args.hidden_dim
        cat = 3 * d  # concat of the three LSTM cell states
        mem = d
        return {
            "lstm_a": lstm_encoder_init(keys[0], args.audio_dim, d),
            "lstm_t": lstm_encoder_init(keys[1], args.text_dim, d),
            "lstm_v": lstm_encoder_init(keys[2], args.video_dim, d),
            "att1": mlp_encoder_init(keys[3], 2 * cat, 2 * cat),
            "att2": mlp_encoder_init(keys[4], 2 * cat, mem),
            "gamma1": mlp_encoder_init(keys[5], 2 * cat + mem, mem),
            "gamma2": mlp_encoder_init(keys[6], 2 * cat + mem, mem),
            "heads": _heads_init(keys[7], 3 * d + mem, args),
        }

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        """train_rng: the reference applies att1/att2/gamma1/gamma2 dropout
        INSIDE the per-timestep memory loop with a fresh mask each step
        (mfn.py:110-115) — here per-step subkeys ride the scan's xs."""
        d = args.hidden_dim
        a, t, v = batch["audios"], batch["texts"], batch["videos"]
        b, steps = a.shape[0], a.shape[1]
        drop_on = train_rng is not None and args.dropout > 0.0

        def lstm_step(p, xt, h, c):
            gates = nn.dense(p["wx"], xt) + nn.dense_nobias(p["wh"], h)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            return jax.nn.sigmoid(o) * jnp.tanh(c), c

        def step(carry, xs):
            if drop_on:
                xa, xt, xv, kt = xs
                dr = lambda i: (jax.random.fold_in(kt, i), args.dropout)
            else:
                xa, xt, xv = xs
                dr = lambda i: None
            (ha, ca), (ht, ct), (hv, cv), mem = carry
            prev_cat = jnp.concatenate([ca, ct, cv], axis=-1)
            ha, ca = lstm_step(params["lstm_a"], xa, ha, ca)
            ht, ct = lstm_step(params["lstm_t"], xt, ht, ct)
            hv, cv = lstm_step(params["lstm_v"], xv, hv, cv)
            new_cat = jnp.concatenate([ca, ct, cv], axis=-1)
            both = jnp.concatenate([prev_cat, new_cat], axis=-1)  # [b, 2·3d]
            attention = jax.nn.softmax(
                mlp_encoder(params["att1"], both, drop=dr(0)), axis=-1)
            attended = both * attention
            c_hat = jnp.tanh(mlp_encoder(params["att2"], attended, drop=dr(1)))
            gate_in = jnp.concatenate([both, mem], axis=-1)
            g1 = jax.nn.sigmoid(mlp_encoder(params["gamma1"], gate_in, drop=dr(2)))
            g2 = jax.nn.sigmoid(mlp_encoder(params["gamma2"], gate_in, drop=dr(3)))
            mem = g1 * mem + g2 * c_hat
            return ((ha, ca), (ht, ct), (hv, cv), mem), None

        zeros = lambda: (jnp.zeros((b, d), a.dtype), jnp.zeros((b, d), a.dtype))
        init = (zeros(), zeros(), zeros(), jnp.zeros((b, d), a.dtype))
        xs = (jnp.swapaxes(a, 0, 1), jnp.swapaxes(t, 0, 1), jnp.swapaxes(v, 0, 1))
        if drop_on:
            xs = xs + (jax.random.split(train_rng, steps),)
        ((ha, _), (ht, _), (hv, _), mem), _ = jax.lax.scan(step, init, xs)
        feats = jnp.concatenate([ha, ht, hv, mem], axis=-1)
        emos, vals = _heads(params["heads"], feats)
        return feats, emos, vals, jnp.zeros(())


# -- Graph-MFN: MFN with a Dynamic Fusion Graph (reference graph_mfn.py) ----------


def _dfg_init(rng, d, dtype=jnp.float32):
    """Dynamic Fusion Graph over modality subsets {a,t,v,av,at,tv,atv}."""
    keys = jax.random.split(rng, 5)
    return {
        "pair_av": mlp_encoder_init(keys[0], 2 * d, d),
        "pair_at": mlp_encoder_init(keys[1], 2 * d, d),
        "pair_tv": mlp_encoder_init(keys[2], 2 * d, d),
        "triple": mlp_encoder_init(keys[3], 3 * d, d),
        "efficacies": nn.dense_init(keys[4], 3 * d, 7),
    }


def _dfg_apply(params, a, t, v, drop=None):
    """Returns the graph output: efficacy-weighted sum of vertex embeddings.
    drop: (key, rate) — the vertex MLPs carry the reference's per-step
    dropout (graph_mfn.py's att/gamma nn.Dropout family)."""
    key, rate = drop if drop is not None else (None, 0.0)
    dr = lambda i: None if key is None else ((_site(key, i), rate))
    gates = jax.nn.sigmoid(
        nn.dense(params["efficacies"], jnp.concatenate([a, t, v], axis=-1))
    )  # [b, 7]
    av = mlp_encoder(params["pair_av"], jnp.concatenate([a, v], axis=-1), drop=dr(0))
    at = mlp_encoder(params["pair_at"], jnp.concatenate([a, t], axis=-1), drop=dr(1))
    tv = mlp_encoder(params["pair_tv"], jnp.concatenate([t, v], axis=-1), drop=dr(2))
    atv = mlp_encoder(params["triple"], jnp.concatenate([a, t, v], axis=-1), drop=dr(3))
    vertices = jnp.stack([a, t, v, av, at, tv, atv], axis=1)  # [b, 7, d]
    return jnp.einsum("bkd,bk->bd", vertices, gates)


@registry.register_model("toolkit_graph_mfn")
class GraphMFN:
    """MFN whose memory update is driven by a Dynamic Fusion Graph over the
    three cell states (reference toolkit/models/graph_mfn.py lineage)."""

    @staticmethod
    def init(rng, args: FusionArgs):
        keys = jax.random.split(rng, 8)
        d = args.hidden_dim
        return {
            "lstm_a": lstm_encoder_init(keys[0], args.audio_dim, d),
            "lstm_t": lstm_encoder_init(keys[1], args.text_dim, d),
            "lstm_v": lstm_encoder_init(keys[2], args.video_dim, d),
            "dfg": _dfg_init(keys[3], d),
            "gamma1": mlp_encoder_init(keys[4], 4 * d, d),
            "gamma2": mlp_encoder_init(keys[5], 4 * d, d),
            "heads": _heads_init(keys[6], 4 * d, args),
        }

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        """train_rng: per-timestep dropout in the DFG vertex MLPs and the
        gamma gates — fresh mask each step, like the reference's in-loop
        nn.Dropout calls (graph_mfn.py:209-212)."""
        d = args.hidden_dim
        a, t, v = batch["audios"], batch["texts"], batch["videos"]
        b, steps = a.shape[0], a.shape[1]
        drop_on = train_rng is not None and args.dropout > 0.0

        def lstm_step(p, xt, h, c):
            gates = nn.dense(p["wx"], xt) + nn.dense_nobias(p["wh"], h)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            return jax.nn.sigmoid(o) * jnp.tanh(c), c

        def step(carry, xs):
            if drop_on:
                xa, xt, xv, kt = xs
                dfg_drop = (jax.random.fold_in(kt, 0), args.dropout)
                dr = lambda i: (jax.random.fold_in(kt, i), args.dropout)
            else:
                xa, xt, xv = xs
                dfg_drop = None
                dr = lambda i: None
            (ha, ca), (ht, ct), (hv, cv), mem = carry
            ha, ca = lstm_step(params["lstm_a"], xa, ha, ca)
            ht, ct = lstm_step(params["lstm_t"], xt, ht, ct)
            hv, cv = lstm_step(params["lstm_v"], xv, hv, cv)
            graph_out = _dfg_apply(params["dfg"], ca, ct, cv, drop=dfg_drop)  # [b, d]
            gate_in = jnp.concatenate([ca, ct, cv, mem], axis=-1)
            g1 = jax.nn.sigmoid(mlp_encoder(params["gamma1"], gate_in, drop=dr(1)))
            g2 = jax.nn.sigmoid(mlp_encoder(params["gamma2"], gate_in, drop=dr(2)))
            mem = g1 * mem + g2 * jnp.tanh(graph_out)
            return ((ha, ca), (ht, ct), (hv, cv), mem), None

        zeros = lambda: (jnp.zeros((b, d), a.dtype), jnp.zeros((b, d), a.dtype))
        init = (zeros(), zeros(), zeros(), jnp.zeros((b, d), a.dtype))
        xs = (jnp.swapaxes(a, 0, 1), jnp.swapaxes(t, 0, 1), jnp.swapaxes(v, 0, 1))
        if drop_on:
            xs = xs + (jax.random.split(train_rng, steps),)
        ((ha, _), (ht, _), (hv, _), mem), _ = jax.lax.scan(step, init, xs)
        feats = jnp.concatenate([ha, ht, hv, mem], axis=-1)
        emos, vals = _heads(params["heads"], feats)
        return feats, emos, vals, jnp.zeros(())


# -- MCTN: cyclic-translation fusion (reference toolkit/models/mctn.py) -----------


@registry.register_model("toolkit_mctn")
class MCTN:
    """Translation-based fusion: encode text, translate to audio and video
    (and cyclically back), use the translation encoder state as the joint
    representation; translation + cycle MSEs are the auxiliary losses
    (the core objective of reference mctn.py; seq2seq decoder reduced to
    per-modality regression heads)."""

    @staticmethod
    def init(rng, args: FusionArgs):
        keys = jax.random.split(rng, 7)
        d = args.hidden_dim
        return {
            "enc_text": lstm_encoder_init(keys[0], args.text_dim, d),
            "to_audio": mlp_encoder_init(keys[1], d, d),
            "audio_out": nn.dense_init(keys[2], d, args.audio_dim),
            "to_video": mlp_encoder_init(keys[3], d, d),
            "video_out": nn.dense_init(keys[4], d, args.video_dim),
            "cycle_text": nn.dense_init(keys[5], d, args.text_dim),
            "heads": _heads_init(keys[6], d, args),
        }

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        """train_rng: dropout on the encoder state (mctn.py:31's
        `self.dropout(enc_state[0].squeeze())`) + the translation MLPs
        (the seq2seq encoder/decoder stacks each carry nn.Dropout,
        mctn.py:20,105)."""
        t_seq = batch["texts"]
        rep = lstm_encoder(params["enc_text"], t_seq,
                           drop=_dr(train_rng, args, 0))  # [b, d]
        audio_target = jnp.mean(batch["audios"], axis=1)
        video_target = jnp.mean(batch["videos"], axis=1)
        text_target = jnp.mean(t_seq, axis=1)

        ha = mlp_encoder(params["to_audio"], rep, drop=_dr(train_rng, args, 1))
        hv = mlp_encoder(params["to_video"], rep, drop=_dr(train_rng, args, 2))
        audio_hat = nn.dense(params["audio_out"], ha)
        video_hat = nn.dense(params["video_out"], hv)
        text_cycle = nn.dense(params["cycle_text"], ha)  # audio-space → text

        interloss = (
            jnp.mean((audio_hat - audio_target) ** 2)
            + jnp.mean((video_hat - video_target) ** 2)
            + jnp.mean((text_cycle - text_target) ** 2)
        )
        emos, vals = _heads(params["heads"], rep)
        return rep, emos, vals, interloss


# -- MFM: factorized generative-discriminative fusion (reference mfm.py) ----------


@registry.register_model("toolkit_mfm")
class MFM:
    """Multimodal Factorization Model: a shared discriminative factor plus
    modality-specific generative factors with reconstruction losses (the
    core factorization objective of reference mfm.py)."""

    @staticmethod
    def init(rng, args: FusionArgs):
        keys = jax.random.split(rng, 9)
        d = args.hidden_dim
        return {
            "encoders": _encoders_init(keys[0], args),
            "shared": mlp_encoder_init(keys[1], 3 * d, d),
            "factor_a": mlp_encoder_init(keys[2], d, d),
            "factor_t": mlp_encoder_init(keys[3], d, d),
            "factor_v": mlp_encoder_init(keys[4], d, d),
            "recon_a": nn.dense_init(keys[5], 2 * d, args.audio_dim),
            "recon_t": nn.dense_init(keys[6], 2 * d, args.text_dim),
            "recon_v": nn.dense_init(keys[7], 2 * d, args.video_dim),
            "heads": _heads_init(keys[8], d, args),
        }

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        """train_rng: encoder dropouts + the factor MLPs' dropout between
        their two layers (mfm.py:184-187 zy/zl/za/zv_to_f* dropouts; the
        fy_to_y head dropout, mfm.py:201, folds into the shared factor's
        second site)."""
        a, t, v = _encode_all(params["encoders"], args, batch, rng=_site(train_rng, 0))
        shared = mlp_encoder(params["shared"], jnp.concatenate([a, t, v], axis=-1),
                             drop=_dr(train_rng, args, 1))
        fa = mlp_encoder(params["factor_a"], a, drop=_dr(train_rng, args, 2))
        ft = mlp_encoder(params["factor_t"], t, drop=_dr(train_rng, args, 3))
        fv = mlp_encoder(params["factor_v"], v, drop=_dr(train_rng, args, 4))

        def target(x):
            return jnp.mean(x, axis=1) if x.ndim == 3 else x

        recon = (
            jnp.mean((nn.dense(params["recon_a"], jnp.concatenate([shared, fa], -1))
                      - target(batch["audios"])) ** 2)
            + jnp.mean((nn.dense(params["recon_t"], jnp.concatenate([shared, ft], -1))
                        - target(batch["texts"])) ** 2)
            + jnp.mean((nn.dense(params["recon_v"], jnp.concatenate([shared, fv], -1))
                        - target(batch["videos"])) ** 2)
        )
        emos, vals = _heads(params["heads"], shared)
        return shared, emos, vals, recon


# -- Attention_TOPN: N-stream attention fusion (attention_topn.py:8-92) ---------


@registry.register_model("toolkit_attention_topn")
class AttentionTopN:
    """Attention fusion over N feature streams (reference
    toolkit/models/attention_topn.py:8-92, used for top-N feature-set
    selection experiments). The reference hand-unrolls encoder0..encoder17
    as named attributes to dodge a torch ModuleList/cuda quirk; here the
    per-stream encoders are a static-length pytree list unrolled at trace
    time — the asserted cap of 18 streams (attention_topn.py:26) is kept
    as the documented envelope but not needed for correctness."""

    @staticmethod
    def _dims(args: FusionArgs) -> Tuple[int, ...]:
        return tuple(args.feat_dims) or (args.audio_dim, args.text_dim, args.video_dim)

    @staticmethod
    def init(rng, args: FusionArgs):
        dims = AttentionTopN._dims(args)
        assert len(dims) <= 18, "reference supports at most 18 streams"
        keys = jax.random.split(rng, len(dims) + 3)
        n = len(dims)
        return {
            "encoders": [mlp_encoder_init(keys[i], d, args.hidden_dim)
                         for i, d in enumerate(dims)],
            "attention_mlp": mlp_encoder_init(keys[n], args.hidden_dim * n, args.hidden_dim),
            "fc_att": nn.dense_init(keys[n + 1], args.hidden_dim, n),
            "heads": _heads_init(keys[n + 2], args.hidden_dim, args),
        }

    @staticmethod
    def apply(params, args: FusionArgs, batch, train_rng=None) -> Tuple:
        if "feat0" in batch:
            streams = [batch[f"feat{i}"] for i in range(len(params["encoders"]))]
        else:  # standard trainer batches: the 3-stream special case
            streams = [batch["audios"], batch["texts"], batch["videos"]]
        # per-stream MLPEncoder dropout (attention_topn.py builds each
        # encoder{i} with args.dropout) + the attention_mlp's
        enc_rng = _site(train_rng, 0) if args.dropout > 0.0 else None
        hiddens = [
            mlp_encoder(p, x, drop=(
                None if enc_rng is None
                else (jax.random.fold_in(enc_rng, i), args.dropout)))
            for i, (p, x) in enumerate(zip(params["encoders"], streams))
        ]
        concat = jnp.concatenate(hiddens, axis=1)
        gate = nn.dense(params["fc_att"], mlp_encoder(
            params["attention_mlp"], concat, drop=_dr(train_rng, args, 1)))
        stacked = jnp.stack(hiddens, axis=2)  # [b, h, n]
        feats = jnp.einsum("bhm,bm->bh", stacked, gate)
        emos, vals = _heads(params["heads"], feats)
        return feats, emos, vals, jnp.zeros(())


FUSION_MODELS: Dict[str, type] = {
    "attention": AttentionFusion,
    "attention_topn": AttentionTopN,
    "tfn": TFN,
    "lmf": LMF,
    "lf_dnn": LFDNN,
    "ef_lstm": EFLSTM,
    "mult": MULT,
    "misa": MISA,
    "mfn": MFN,
    "mmim": MMIM,
    "graph_mfn": GraphMFN,
    "mctn": MCTN,
    "mfm": MFM,
}
