"""Qwen2/2.5-family causal decoder with fused LoRA, TPU-native.

Replaces the reference's HF `AutoModelForCausalLM` + PEFT wrapper
(reference: my_affectgpt/models/affectgpt.py:92-133) with a functional
JAX implementation designed for the MXU:

- GQA attention with RoPE, fp32 softmax, bf16 weights.
- LoRA adapters on q/k/v/o and gate/up/down of every layer (the
  reference's target set, affectgpt.py:113-121) computed as a parallel
  low-rank branch: y = W·x + (α/r)·B·(A·x). The frozen base matmul and
  the two skinny LoRA matmuls batch onto the MXU; no weight
  materialization of W+BA, so HBM traffic stays at base-weight size.
- Accepts precomputed `inputs_embeds` (the multimodal splice path) like
  the reference's inputs_embeds forward (affectgpt.py:1019-1027).
- Single-source attention used for both full-sequence training and
  KV-cache decode (decode passes cache and position offsets).

Weight layout matches HF Qwen2 for direct checkpoint conversion:
q/k/v have biases, o does not; gate/up/down are bias-free; RMSNorm.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from affectgpt_tpu.models import nn


@dataclass(frozen=True)
class QwenConfig:
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-6
    tie_embeddings: bool = False
    qkv_bias: bool = True  # Qwen2 has q/k/v biases; Llama-family has none
    lora_r: int = 16
    lora_alpha: float = 32.0
    # peft LoraConfig(lora_dropout=...) — the reference builds every LLM
    # with 0.05 (my_affectgpt/models/affectgpt.py:123). Train-only: the
    # rate is applied iff forward() receives dropout_rng; inference never
    # passes one, matching torch eval-mode identity.
    lora_dropout: float = 0.05

    @classmethod
    def qwen25_7b(cls, vocab_size: int = 152064, lora_r: int = 16):
        """Qwen2.5-7B-Instruct geometry (the reference's production LLM)."""
        return cls(vocab_size=vocab_size, lora_r=lora_r)

    @classmethod
    def llama2_7b(cls, vocab_size: int = 32000, lora_r: int = 16):
        """Llama-2-7B geometry — the reference's alternate LLM family
        (reference: my_affectgpt/models/affectgpt.py:92-133, PATH_TO_LLM
        'Llama2'). MHA (kv=heads), no qkv bias, rope 10k, eps 1e-5."""
        return cls(
            vocab_size=vocab_size, hidden_size=4096, intermediate_size=11008,
            num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
            rope_theta=10_000.0, rms_eps=1e-5, qkv_bias=False, lora_r=lora_r,
        )

    @classmethod
    def baichuan2_7b(cls, vocab_size: int = 125696, lora_r: int = 16):
        """Baichuan2-7B geometry — the reference's third LLM family
        (my_affectgpt/models/affectgpt.py:92-103, trust_remote_code branch).
        Llama-shaped: MHA, no qkv bias, rope 10k, eps 1e-6; the fused
        W_pack and NormHead deltas are handled in convert.convert_baichuan2."""
        return cls(
            vocab_size=vocab_size, hidden_size=4096, intermediate_size=11008,
            num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
            rope_theta=10_000.0, rms_eps=1e-6, qkv_bias=False, lora_r=lora_r,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 300, lora_r: int = 2):
        return cls(
            vocab_size=vocab_size, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
            rope_theta=10_000.0, lora_r=lora_r, lora_alpha=4.0,
        )


# ---------------------------------------------------------------------------
# Init


def _lora_init(rng, in_dim: int, out_dim: int, r: int, dtype=jnp.float32):
    ka, _ = jax.random.split(rng)
    # A ~ kaiming-ish normal, B = 0 → adapter starts as identity (PEFT default)
    return {
        "a": (jax.random.normal(ka, (in_dim, r)) * (1.0 / jnp.sqrt(in_dim))).astype(dtype),
        "b": jnp.zeros((r, out_dim), dtype=dtype),
    }


def init_params(rng: jax.Array, cfg: QwenConfig, dtype=jnp.bfloat16) -> dict:
    """Frozen base parameters (would come from a converted HF checkpoint)."""
    n_kv_dim = cfg.num_kv_heads * cfg.head_dim
    n_q_dim = cfg.num_heads * cfg.head_dim
    keys = jax.random.split(rng, cfg.num_layers + 3)
    layers = []
    qkv_init = nn.dense_init if cfg.qkv_bias else nn.dense_nobias_init
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[i], 7)
        layers.append(
            {
                "q_proj": qkv_init(k[0], cfg.hidden_size, n_q_dim, dtype=dtype),
                "k_proj": qkv_init(k[1], cfg.hidden_size, n_kv_dim, dtype=dtype),
                "v_proj": qkv_init(k[2], cfg.hidden_size, n_kv_dim, dtype=dtype),
                "o_proj": nn.dense_nobias_init(k[3], n_q_dim, cfg.hidden_size, dtype=dtype),
                "gate_proj": nn.dense_nobias_init(k[4], cfg.hidden_size, cfg.intermediate_size, dtype=dtype),
                "up_proj": nn.dense_nobias_init(k[5], cfg.hidden_size, cfg.intermediate_size, dtype=dtype),
                "down_proj": nn.dense_nobias_init(k[6], cfg.intermediate_size, cfg.hidden_size, dtype=dtype),
                "input_ln": nn.rmsnorm_init(cfg.hidden_size, dtype=dtype),
                "post_attn_ln": nn.rmsnorm_init(cfg.hidden_size, dtype=dtype),
            }
        )
    params = {
        "embed_tokens": nn.embedding_init(keys[-3], cfg.vocab_size, cfg.hidden_size, dtype=dtype),
        "layers": layers,
        "final_ln": nn.rmsnorm_init(cfg.hidden_size, dtype=dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = nn.dense_nobias_init(keys[-2], cfg.hidden_size, cfg.vocab_size, dtype=dtype)
    return params


_LORA_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


def init_lora(rng: jax.Array, cfg: QwenConfig, dtype=jnp.float32) -> dict:
    """Trainable LoRA adapters for every layer's 7 target matmuls
    (reference target set, affectgpt.py:113-121)."""
    n_kv_dim = cfg.num_kv_heads * cfg.head_dim
    n_q_dim = cfg.num_heads * cfg.head_dim
    dims = {
        "q_proj": (cfg.hidden_size, n_q_dim),
        "k_proj": (cfg.hidden_size, n_kv_dim),
        "v_proj": (cfg.hidden_size, n_kv_dim),
        "o_proj": (n_q_dim, cfg.hidden_size),
        "gate_proj": (cfg.hidden_size, cfg.intermediate_size),
        "up_proj": (cfg.hidden_size, cfg.intermediate_size),
        "down_proj": (cfg.intermediate_size, cfg.hidden_size),
    }
    layers = []
    for i in range(cfg.num_layers):
        k = jax.random.split(jax.random.fold_in(rng, i), len(_LORA_TARGETS))
        layers.append(
            {
                name: _lora_init(k[j], *dims[name], cfg.lora_r, dtype=dtype)
                for j, name in enumerate(_LORA_TARGETS)
            }
        )
    return {"layers": layers}


# ---------------------------------------------------------------------------
# Forward


def _int8_shapes_ok(x2d, w_q, block_m: int = 256, block_n: int = 512, block_k: int = 512) -> bool:
    m = x2d.shape[0]
    k, n = w_q.shape
    return (
        m % min(block_m, m) == 0
        and n % min(block_n, n) == 0
        and k % min(block_k, k) == 0
    )


def merge_lora(params: dict, lora: dict, cfg: QwenConfig) -> dict:
    """Fold trained LoRA adapters into the base weights for SERVING:
    W' = W + (α/r)·A·B, exactly the parallel-branch math in _lora_dense.
    A decode step then skips 2 adapter dots per projection (~400 small ops
    per step at 7B — measurable per-step overhead); quantization applied
    AFTER merging also sees the adapted weights (standard deploy practice,
    mirrors PEFT merge_and_unload which the reference relies on HF for).
    Training keeps adapters separate (gradients need them)."""
    scaling = cfg.lora_alpha / cfg.lora_r
    out = dict(params)
    layers = []
    for layer, lora_layer in zip(params["layers"], lora["layers"]):
        merged = dict(layer)
        for name in _LORA_TARGETS:
            if name not in lora_layer:
                continue
            ab = jnp.dot(
                lora_layer[name]["a"].astype(jnp.float32),
                lora_layer[name]["b"].astype(jnp.float32),
            )
            base = dict(layer[name])
            base["w"] = (base["w"].astype(jnp.float32) + scaling * ab).astype(
                layer[name]["w"].dtype
            )
            merged[name] = base
        layers.append(merged)
    out["layers"] = layers
    return out


def fuse_qkv_gateup(params: dict, cfg: QwenConfig, fuse_gateup: bool = True) -> dict:
    """Serving-layout transform: concatenate q/k/v into one [h, nq+2·nkv]
    matmul and (optionally) gate/up into one [h, 2·I] matmul. Exactly equal
    math (a dot against concatenated columns computes each output column
    identically, and per-output-channel quantization commutes with the
    concat), but a decode step runs up to 3 fewer matmul ops per layer —
    q=1 decode is op-dispatch-bound, not FLOPs-bound. Apply AFTER
    merge_lora and BEFORE quantize_params; single-chip layout only (a tp
    mesh would shard the concatenated columns across the q/k/v boundary).

    fuse_gateup=False keeps gate/up split: the fused [h, 2·I] leaf's
    prefill-time XLA dequant transient (~271 MB bf16 at 7B) is what OOMs
    fused serving at b352 — the qkv-only layout keeps 2 of the 3 saved
    decode ops with a transient 8× smaller."""
    layers = []
    for layer in params["layers"]:
        assert "w" in layer["q_proj"], "fuse_qkv_gateup expects unquantized weights"
        drop = ("q_proj", "k_proj", "v_proj") + (
            ("gate_proj", "up_proj") if fuse_gateup else ()
        )
        fused = {k: v for k, v in layer.items() if k not in drop}
        qkv = {
            "w": jnp.concatenate(
                [layer[n]["w"] for n in ("q_proj", "k_proj", "v_proj")], axis=1
            )
        }
        if "b" in layer["q_proj"]:
            qkv["b"] = jnp.concatenate(
                [layer[n]["b"] for n in ("q_proj", "k_proj", "v_proj")]
            )
        fused["qkv_proj"] = qkv
        if fuse_gateup:
            fused["gateup_proj"] = {
                "w": jnp.concatenate(
                    [layer["gate_proj"]["w"], layer["up_proj"]["w"]], axis=1
                )
            }
        layers.append(fused)
    return {**params, "layers": layers}


def quantize_params(params: dict, bits: int = 8) -> dict:
    """Quantize the decoder projection weights for serving (bits=8 per-channel
    int8, bits=4 group-128 int4 — halves the decode HBM read again); embeddings
    and norms stay bf16 (embedding gathers are cheap; norms are vectors)."""
    from affectgpt_tpu.ops import quant

    out = dict(params)
    out["layers"] = [quant.quantize_dense_tree(layer, bits=bits) for layer in params["layers"]]
    if "lm_head" in params:
        out["lm_head"] = quant.quantize_dense_tree(params["lm_head"], bits=bits)
    return out


def init_quantized_params(
    rng: jax.Array, cfg: QwenConfig, bits: int = 4, dtype=jnp.bfloat16, fused: bool = False
) -> dict:
    """Random decoder weights created DIRECTLY in quantized form (benchmark /
    smoke-test utility): at 7B geometry the bf16 master tree (15.2 GB) does
    not fit one v5e HBM, and shipping host-quantized weights through the axon
    relay is impractically slow — so each dense leaf is born as random int4/int8
    values + a scale matching a N(0, 1/K) init's group absmax. Compute/memory
    profile is identical to a converted real checkpoint."""
    from affectgpt_tpu.ops import quant

    assert bits in (8, 4)

    def qdense(key, k, n, bias: bool):
        kq, kq2 = jax.random.split(key)
        sigma = 1.0 / float(k) ** 0.5
        if bits == 4 and k % (2 * quant.INT4_GROUP) == 0:
            # nibbles drawn in [-7, 7] — the range quantize_int4_grouped
            # actually produces — and packed with the same (hi<<4)|(lo&0xF)
            # scheme, so synthetic weights match a converted checkpoint's
            # value distribution exactly
            lo = jax.random.randint(kq, (k // 2, n), -7, 8, dtype=jnp.int32)
            hi = jax.random.randint(kq2, (k // 2, n), -7, 8, dtype=jnp.int32)
            w_p = ((hi << 4) | (lo & 0xF)).astype(jnp.int8)
            scales = jnp.full((k // quant.INT4_GROUP, n), 3.0 * sigma / 7.0, jnp.float32)
            out = {"w_q4": w_p, "scales": scales}
        else:
            w_q = jax.random.randint(kq, (k, n), -127, 128, dtype=jnp.int32).astype(jnp.int8)
            out = {"w_q": w_q, "scales": jnp.full((1, n), 3.0 * sigma / 127.0, jnp.float32)}
        if bias:
            out["b"] = jnp.zeros((n,), dtype=dtype)
        return out

    n_kv_dim = cfg.num_kv_heads * cfg.head_dim
    n_q_dim = cfg.num_heads * cfg.head_dim
    keys = jax.random.split(rng, cfg.num_layers + 3)
    layers = []
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[i], 7)
        if fused:  # serving layout (fuse_qkv_gateup): qkv (+ gateup) concat;
            # fused="qkv" keeps gate/up split (smaller prefill dequant
            # transient — see fuse_qkv_gateup)
            layer = {
                "qkv_proj": qdense(k[0], cfg.hidden_size, n_q_dim + 2 * n_kv_dim, cfg.qkv_bias),
                "o_proj": qdense(k[3], n_q_dim, cfg.hidden_size, False),
                "down_proj": qdense(k[6], cfg.intermediate_size, cfg.hidden_size, False),
            }
            if fused == "qkv":
                layer["gate_proj"] = qdense(k[4], cfg.hidden_size, cfg.intermediate_size, False)
                layer["up_proj"] = qdense(k[5], cfg.hidden_size, cfg.intermediate_size, False)
            else:
                layer["gateup_proj"] = qdense(k[4], cfg.hidden_size, 2 * cfg.intermediate_size, False)
        else:
            layer = {
                "q_proj": qdense(k[0], cfg.hidden_size, n_q_dim, cfg.qkv_bias),
                "k_proj": qdense(k[1], cfg.hidden_size, n_kv_dim, cfg.qkv_bias),
                "v_proj": qdense(k[2], cfg.hidden_size, n_kv_dim, cfg.qkv_bias),
                "o_proj": qdense(k[3], n_q_dim, cfg.hidden_size, False),
                "gate_proj": qdense(k[4], cfg.hidden_size, cfg.intermediate_size, False),
                "up_proj": qdense(k[5], cfg.hidden_size, cfg.intermediate_size, False),
                "down_proj": qdense(k[6], cfg.intermediate_size, cfg.hidden_size, False),
            }
        layer["input_ln"] = nn.rmsnorm_init(cfg.hidden_size, dtype=dtype)
        layer["post_attn_ln"] = nn.rmsnorm_init(cfg.hidden_size, dtype=dtype)
        layers.append(layer)
    params = {
        "embed_tokens": nn.embedding_init(keys[-3], cfg.vocab_size, cfg.hidden_size, dtype=dtype),
        "layers": layers,
        "final_ln": nn.rmsnorm_init(cfg.hidden_size, dtype=dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = qdense(keys[-2], cfg.hidden_size, cfg.vocab_size, False)
    return params


def _lora_drop_fwd(rate, x, a, b, key):
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    xl = jnp.where(keep, x / jnp.asarray(1.0 - rate, x.dtype), jnp.zeros((), x.dtype))
    z = jnp.dot(xl, a.astype(x.dtype), preferred_element_type=jnp.float32)
    return jnp.dot(z.astype(x.dtype), b.astype(x.dtype),
                   preferred_element_type=jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lora_drop_branch(rate, x, a, b, key):
    """B(A(dropout(x))) with a custom VJP that REGENERATES the dropout mask
    from `key` in the backward pass instead of letting autodiff carry the
    mask + dropped-copy + A-activation residuals from the (rematted)
    forward recompute to the backward sweep. Residuals are just
    (x, a, b, key) — all already live — so the only extra backward work is
    one rbg mask regeneration + the two small recomputed intermediates.
    Forward math is bit-identical to the plain path (same ops, same key);
    gradients match autodiff up to dot-reassociation rounding
    (tests/test_lora_dropout.py pins both). Opt-in via
    AFFECTGPT_DROPOUT_VJP=1 (A/B'd on TPU at 3B b8, see CLAUDE.md)."""
    return _lora_drop_fwd(rate, x, a, b, key)


def _lora_drop_branch_fwd(rate, x, a, b, key):
    return _lora_drop_fwd(rate, x, a, b, key), (x, a, b, key)


def _lora_drop_branch_bwd(rate, res, g):
    import numpy as _np
    from jax.dtypes import float0 as _float0

    x, a, b, key = res
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    inv = jnp.asarray(1.0 - rate, x.dtype)
    xl = jnp.where(keep, x / inv, jnp.zeros((), x.dtype))
    ax, bx = a.astype(x.dtype), b.astype(x.dtype)
    z1 = jnp.dot(xl, ax, preferred_element_type=jnp.float32).astype(x.dtype)
    gx = g.astype(x.dtype)
    db = jnp.einsum("...r,...o->ro", z1, gx,
                    preferred_element_type=jnp.float32).astype(b.dtype)
    g1 = jnp.dot(gx, bx.T, preferred_element_type=jnp.float32).astype(x.dtype)
    da = jnp.einsum("...i,...r->ir", xl, g1,
                    preferred_element_type=jnp.float32).astype(a.dtype)
    dxl = jnp.dot(g1, ax.T, preferred_element_type=jnp.float32).astype(x.dtype)
    dx = jnp.where(keep, dxl / inv, jnp.zeros((), x.dtype))
    return dx, da, db, _np.zeros(key.shape, dtype=_float0)


_lora_drop_branch.defvjp(_lora_drop_branch_fwd, _lora_drop_branch_bwd)


def _dropout_vjp_on() -> bool:
    import os as _os

    return _os.environ.get("AFFECTGPT_DROPOUT_VJP", "0") == "1"


def _lora_dense(base, lora, x, scaling: float, has_bias: bool = True, drop=None):
    """drop: optional (key, rate) — inverted dropout on the LoRA-branch
    input only (the frozen base matmul is never dropped), exactly peft's
    `B(A(dropout(x)))·scale` train-mode math. Each wrapped projection gets
    its own independent mask, like peft's per-module nn.Dropout."""
    if "w_q4" in base:
        # int4 serving mode: fused grouped-dequant matmul for decode-shaped
        # M (HBM-bound — the packed weights are the traffic); prefill-shaped
        # M takes the XLA dequant path, whose transient bf16 weight buffer
        # lets the matmul run at full MXU rate (prefill is compute-bound;
        # re-streaming weights per Pallas M-block would add ~25% traffic).
        from affectgpt_tpu.ops import quant

        orig_shape = x.shape
        x2d = x.reshape(-1, orig_shape[-1])
        if (
            jax.default_backend() == "tpu"
            and x2d.shape[0] <= quant.PALLAS_DEQUANT_MAX_M
            and quant.int4_shapes_ok(x2d, base["w_q4"])
        ):
            # decode-shaped M below the floor takes the small-M kernel
            # (tile dequant into VMEM + one fat dot — Mosaic's subgroup-
            # unrolled dots are pathological at M≤8)
            kern = (
                quant.int4_matmul_smallm
                if x2d.shape[0] < quant.PALLAS_INT4_MIN_M
                else quant.int4_matmul
            )
            y = kern(x2d, base["w_q4"], base["scales"]).astype(jnp.float32)
        else:
            y = quant.int4_matmul_xla(x2d, base["w_q4"], base["scales"]).astype(jnp.float32)
        y = y.reshape(*orig_shape[:-1], base["w_q4"].shape[1])
    elif "w_q" in base:
        # int8 serving mode: fused dequant matmul (Pallas on TPU, XLA
        # elsewhere). Same M dispatch as int4: Pallas streams int8 tiles for
        # decode, XLA dequant for compute-bound prefill (w8a8 always runs the
        # Pallas kernel — its point is int8×int8 MXU compute).
        from affectgpt_tpu.ops import quant

        orig_shape = x.shape
        x2d = x.reshape(-1, orig_shape[-1])
        w8a8 = quant.MATMUL_MODE == "w8a8"
        if (
            jax.default_backend() == "tpu"
            and (w8a8 or x2d.shape[0] <= quant.PALLAS_DEQUANT_MAX_M)
            and _int8_shapes_ok(x2d, base["w_q"])
        ):
            kernel = quant.int8_matmul_w8a8 if w8a8 else quant.int8_matmul
            y = kernel(x2d, base["w_q"], base["scales"]).astype(jnp.float32)
        else:
            y = quant.int8_matmul_xla(x2d, base["w_q"], base["scales"]).astype(jnp.float32)
        y = y.reshape(*orig_shape[:-1], base["w_q"].shape[1])
    else:
        y = jnp.dot(x, base["w"], preferred_element_type=jnp.float32)
    if lora is not None:
        if drop is not None and _dropout_vjp_on():
            z = _lora_drop_branch(drop[1], x, lora["a"], lora["b"], drop[0])
        else:
            xl = x
            if drop is not None:
                xl = nn.dropout(drop[0], drop[1], x)
            z = jnp.dot(xl, lora["a"].astype(x.dtype), preferred_element_type=jnp.float32)
            z = jnp.dot(z.astype(x.dtype), lora["b"].astype(x.dtype), preferred_element_type=jnp.float32)
        y = y + scaling * z
    if has_bias and "b" in base:
        y = y + base["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding, HF half-split convention. x [b, t, h, d],
    positions [b, t]."""
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))  # [d/2]
    angles = positions[..., None].astype(jnp.float32) * freqs  # [b, t, d/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


# Trace-time switch for the single-token decode attention: "xla" (fused by
# the compiler) or "pallas" (ops/decode_attention_pallas one-kernel chain).
# TPU-only; every other path ignores it.
DECODE_ATTENTION = "xla"

# Trace-time switch for the single-token decode MLP. "auto" (default)
# fuses rmsnorm → gate/up → silu·mul → down → residual into one kernel on
# the bf16 split layout (ops/decode_mlp_bf16_pallas; TPU-measured +1.3%
# e2e at 3B b384 — q=1 decode is op-dispatch-bound). "pallas" additionally
# forces the int8 sibling (ops/decode_mlp_pallas; measured −1.5% at 7B —
# the per-tile int8→bf16 convert eats the fusion win, so auto skips it).
# "xla" disables both.
DECODE_MLP = "auto"

# Trace-time switch for the single-token decode q/k/v projections: fuses
# the three projections (+bias) and rotary embedding into one kernel with
# VMEM-resident weights (ops/decode_qkv_pallas; TPU-measured +1.5% e2e at
# 3B b384). bf16 split layout, merged LoRA, TPU, t==1 only; "auto"
# (default) additionally requires the resident q/k/v weights ≤ 12 MB.
DECODE_QKV = "auto"

# Trace-time switch for the PREFILL attention: "flash" routes the t>1
# cache-populating forward through JAX's stock TPU flash-attention Pallas
# op (jax.experimental.pallas.ops.tpu.flash_attention) over the LOCAL
# just-projected k/v with causal + left-pad segment masking, instead of
# the XLA einsum chain over the full cache (which materializes the
# [b, kv, g, t, max_len] fp32 score tensor — 755 MB at 3B b384). GQA rides
# as a kv-head repeat (the op wants equal q/kv head counts). TPU-measured
# a 4.5% LOSS at 3B b384 (151.4 vs 158.1-159.1 clips/s, token-IDENTICAL):
# the materialized 8× K/V repeat + op overhead outweigh the score-tensor
# savings — the same verdict as every other attention-kernel probe on
# this stack (decode_attention neutral, decode attn+o −1.5%, CLIP flash
# e2e-neutral). Stays "xla"; BENCH_PREFILL_ATTN in bench.py.
PREFILL_ATTENTION = "xla"

# Trace-time switch for the decode attention BACK half: QK^T → online
# softmax → PV → o_proj → residual in one kernel with W_o VMEM-resident
# (ops/decode_attn_o_pallas). Only engages on top of the fused qkv kernel
# (needs the raw residual stream + roped q it produces). TPU-measured a
# 1.5% LOSS at 3B b384 (156.75 vs 159.09 clips/s) — XLA already schedules
# the decode attention chain at (better than) kernel speed, matching the
# earlier neutral decode_attention_pallas result; with qkv-fused +1.5%,
# MLP-fused +1.3%, attention-fused −1.5%, a full-layer decode megakernel
# cannot win on this stack (its attention portion is the loss) — the
# VERDICT round-2 item-10 probe, closed out. Stays "xla"; "pallas" forces,
# "auto" gates on resident W_o ≤ 12 MB. BENCH_DECODE_ATTN_O in bench.py.
DECODE_ATTN_O = "xla"


# Set via mark_tp_serving() by the tp>1 serving constructors
# (BatchServer/PagedBatchServer/Chat with a mesh): the fused decode Pallas
# kernels carry no GSPMD partitioning rule, so under a sharded jit XLA
# would REPLICATE their operands — a per-layer weight all-gather every
# decode step. Trace-time flag, deliberately STICKY for the process
# (serving processes are single-purpose; mixing sharded and unsharded
# engines in one process would otherwise re-trace with kernels that the
# sharded engine cannot run). Tests reset it per test (conftest).
TP_SERVING = False


def mark_tp_serving() -> None:
    """Disable the fused decode Pallas kernels for this process — call from
    any engine that serves GSPMD-sharded weight trees."""
    global TP_SERVING
    TP_SERVING = True


def _decode_kernel_backend_ok() -> bool:
    """Fused decode kernels run on TPU; AFFECTGPT_DECODE_KERNEL_INTERPRET=1
    additionally enables them in Pallas interpret mode off-TPU so the
    dispatch wiring (incl. the paged engine's) is testable on CPU."""
    import os

    if TP_SERVING:
        return False
    if jax.default_backend() == "tpu":
        return True
    return os.environ.get("AFFECTGPT_DECODE_KERNEL_INTERPRET", "0") == "1"


def _decode_kernel_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _decode_qkv_fused(
    layer, lora_layer, cfg: QwenConfig, x2d: jnp.ndarray, pos1d: jnp.ndarray,
    ln: Optional[dict] = None,
) -> Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Fused decode q/k/v dispatch shared by the dense decode step and the
    paged engine: 3 projections + biases + rope in one kernel with
    VMEM-resident weights (ops/decode_qkv_pallas; q=1 decode is
    op-overhead-bound). x2d [b, hidden], pos1d [b]. With ln (the input_ln
    param dict) given, x2d is the RAW residual stream and the pre-attention
    rmsnorm also runs in-kernel. Returns
    (q [b, heads, d], k [b, kv, d], v [b, kv, d]) with rope already
    applied, or None when the kernel isn't eligible (caller falls back to
    the per-projection path — and must then norm x2d itself when it passed
    ln)."""
    b = x2d.shape[0]
    n_q_dim = cfg.num_heads * cfg.head_dim
    n_kv_dim = cfg.num_kv_heads * cfg.head_dim
    if not (
        DECODE_QKV in ("auto", "pallas")
        and lora_layer is None
        and "w" in layer["q_proj"]
        and cfg.head_dim % 2 == 0
        and cfg.hidden_size % 128 == 0
        and n_q_dim % 128 == 0
        and n_kv_dim % 128 == 0
        and _decode_kernel_backend_ok()
        and b % 8 == 0
    ):
        return None
    # auto: only when the VMEM-resident q/k/v weights actually fit
    if DECODE_QKV != "pallas" and (
        cfg.hidden_size * (n_q_dim + 2 * n_kv_dim)
        * jnp.dtype(layer["q_proj"]["w"].dtype).itemsize
        > 12 * 2**20
    ):
        return None
    from affectgpt_tpu.ops.decode_qkv_pallas import decode_qkv

    zq = jnp.zeros((n_q_dim,), x2d.dtype)
    zkv = jnp.zeros((n_kv_dim,), x2d.dtype)
    q2, k2, v2 = decode_qkv(
        x2d, pos1d,
        layer["q_proj"]["w"], layer["q_proj"].get("b", zq),
        layer["k_proj"]["w"], layer["k_proj"].get("b", zkv),
        layer["v_proj"]["w"], layer["v_proj"].get("b", zkv),
        num_heads=cfg.num_heads, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, theta=cfg.rope_theta,
        ln_scale=None if ln is None else ln["scale"], eps=cfg.rms_eps,
        interpret=_decode_kernel_interpret(),
    )
    return (
        q2.reshape(b, cfg.num_heads, cfg.head_dim),
        k2.reshape(b, cfg.num_kv_heads, cfg.head_dim),
        v2.reshape(b, cfg.num_kv_heads, cfg.head_dim),
    )


def _decode_mlp_fused(
    layer, lora_layer, cfg: QwenConfig, x: jnp.ndarray
) -> Optional[jnp.ndarray]:
    """Fused decode-MLP dispatch shared by the dense decode step and the
    paged engine: rmsnorm → gate/up → silu·mul → down → residual in one
    kernel. x [b, 1, hidden] (post-attention residual stream). Returns the
    new residual stream [b, 1, hidden], or None when no kernel is eligible
    (caller falls back to rmsnorm + _mlp)."""
    b = x.shape[0]
    if (
        DECODE_MLP in ("auto", "pallas")
        and lora_layer is None
        and "w" in layer.get("gate_proj", {})
        and cfg.intermediate_size % 128 == 0
        and cfg.hidden_size % 128 == 0
        and _decode_kernel_backend_ok()
        and b % 8 == 0
    ):
        # bf16 split layout (ops/decode_mlp_bf16_pallas; TPU-measured +1.3%
        # e2e at 3B b384 — weights stream, activations stay in VMEM)
        from affectgpt_tpu.ops.decode_mlp_bf16_pallas import (
            decode_mlp_bf16,
            fits_vmem,
        )

        # the one-tile batch layout scales VMEM with b: past the bound
        # (b=512 at 3B geometry) no weight block fits Mosaic's 16 MB
        # scoped limit and the kernel cannot compile — fall back to XLA
        ws = jnp.dtype(layer["gate_proj"]["w"].dtype).itemsize
        if not fits_vmem(b, cfg.hidden_size, ws):
            return None

        y = decode_mlp_bf16(
            x[:, 0, :], layer["post_attn_ln"]["scale"],
            layer["gate_proj"]["w"], layer["up_proj"]["w"],
            layer["down_proj"]["w"], eps=cfg.rms_eps,
            interpret=_decode_kernel_interpret(),
        )
        return y[:, None, :]
    if (
        DECODE_MLP == "pallas"
        and lora_layer is None
        and "w_q" in layer.get("gate_proj", {})
        and _decode_kernel_backend_ok()
        and b % 8 == 0
        and cfg.intermediate_size % 512 == 0
    ):
        # int8 sibling (ops/decode_mlp_pallas; measured −1.5% at 7B — the
        # per-tile int8→bf16 convert eats the fusion win, so auto skips it)
        from affectgpt_tpu.ops.decode_mlp_pallas import decode_mlp_pallas

        y = decode_mlp_pallas(
            x[:, 0, :], layer["post_attn_ln"]["scale"],
            layer["gate_proj"]["w_q"], layer["gate_proj"]["scales"],
            layer["up_proj"]["w_q"], layer["up_proj"]["scales"],
            layer["down_proj"]["w_q"], layer["down_proj"]["scales"],
            eps=cfg.rms_eps, interpret=_decode_kernel_interpret(),
        )
        return y[:, None, :]
    return None


def _flash_prefill_attention(
    cfg: QwenConfig, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mask: jnp.ndarray, t: int,
) -> jnp.ndarray:
    """Prefill self-attention through JAX's stock TPU flash-attention op.
    q [b, t, H, d]; k/v [b, kv, t, d] (the local, pre-cache-write
    projections); mask [b, 1, t, max_len] (causal & left-pad validity —
    the left-pack means key validity is a per-row prefix mask, recovered
    from the LAST query row's local columns). Returns [b, t, H*d]."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b = q.shape[0]
    groups = cfg.num_heads // cfg.num_kv_heads
    qh = q.transpose(0, 2, 1, 3)  # [b, H, t, d]
    kh = jnp.repeat(k, groups, axis=1)  # GQA: the op wants equal head counts
    vh = jnp.repeat(v, groups, axis=1)
    # pads carry segment 0, real tokens segment 1 → pads never attend real
    seg = mask[:, 0, t - 1, :t].astype(jnp.int32)  # [b, t]
    bq = 512
    while t % bq:
        bq //= 2
    bs = fa.BlockSizes.get_default(b, cfg.num_heads, t, t, cfg.head_dim)
    import dataclasses as _dc

    bs = _dc.replace(
        bs,
        **{f.name: min(getattr(bs, f.name), bq) for f in _dc.fields(bs)},
    )
    out = fa.flash_attention(
        qh, kh, vh, segment_ids=fa.SegmentIds(q=seg, kv=seg), causal=True,
        sm_scale=1.0 / float(cfg.head_dim) ** 0.5, block_sizes=bs,
    )  # [b, H, t, d]
    return out.transpose(0, 2, 1, 3).reshape(b, t, cfg.num_heads * cfg.head_dim)


def _quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization over the trailing (head_dim) axis.
    Returns (int8 values, float32 scale [..., 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = amax / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(scale, 1e-20))
    return q.astype(jnp.int8), scale


# stable per-projection dropout-key offsets (peft: one independent
# nn.Dropout per wrapped module)
_LORA_DROP_IDS = {
    "q_proj": 0, "k_proj": 1, "v_proj": 2, "o_proj": 3,
    "gate_proj": 4, "up_proj": 5, "down_proj": 6,
}


def _lora_drop(drop_rng, cfg: QwenConfig, name: str):
    if drop_rng is None or cfg.lora_dropout <= 0.0:
        return None
    return (jax.random.fold_in(drop_rng, _LORA_DROP_IDS[name]), cfg.lora_dropout)


def _attention(
    layer, lora_layer, cfg: QwenConfig, x: jnp.ndarray, positions: jnp.ndarray,
    mask: jnp.ndarray, cache: Optional[dict], cache_index: Optional[jnp.ndarray],
    pre_ln: Optional[dict] = None,
    drop_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Optional[dict], bool]:
    """Returns (out, new_cache, residual_done): residual_done=True means the
    fused attn+o kernel already added the residual stream into out (the
    caller must NOT add x again).

    pre_ln: when given, x is the RAW residual stream and this function
    owns the pre-attention rmsnorm — the fused decode-qkv kernel then folds
    it in-VMEM (one fewer [b,d] HBM round trip per layer per decode step);
    every fallback path norms explicitly first."""
    b, t, _ = x.shape
    scaling = cfg.lora_alpha / cfg.lora_r
    lget = (lambda n: lora_layer[n]) if lora_layer is not None else (lambda n: None)

    n_q_dim = cfg.num_heads * cfg.head_dim
    n_kv_dim = cfg.num_kv_heads * cfg.head_dim
    roped = False
    fused = None
    if cache is not None and t == 1 and "qkv_proj" not in layer:
        fused = _decode_qkv_fused(
            layer, lora_layer, cfg, x[:, 0, :], positions[:, 0], ln=pre_ln
        )
    if pre_ln is not None and fused is None:
        x = nn.rmsnorm(pre_ln, x, cfg.rms_eps)
    if "qkv_proj" in layer:
        # fused serving layout (fuse_qkv_gateup): one matmul, split columns
        assert lora_layer is None, "fused layout serves merged-LoRA weights"
        y = _lora_dense(layer["qkv_proj"], None, x, 0.0)
        q = y[..., :n_q_dim].reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = y[..., n_q_dim : n_q_dim + n_kv_dim].reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = y[..., n_q_dim + n_kv_dim :].reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    elif fused is not None:
        q = fused[0].reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = fused[1].reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = fused[2].reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        roped = True  # kernel applied rope in-VMEM
    else:
        q = _lora_dense(layer["q_proj"], lget("q_proj"), x, scaling,
                        drop=_lora_drop(drop_rng, cfg, "q_proj")).reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = _lora_dense(layer["k_proj"], lget("k_proj"), x, scaling,
                        drop=_lora_drop(drop_rng, cfg, "k_proj")).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = _lora_dense(layer["v_proj"], lget("v_proj"), x, scaling,
                        drop=_lora_drop(drop_rng, cfg, "v_proj")).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)

    if not roped:
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)

    # K/V live in [b, kv_heads, T, d] layout: the decode-step QK^T and PV
    # dots then have their batch dims (b, h) leading in the SAME positions
    # on both operands, so XLA never materializes a per-step transpose of
    # the cache (TPU-measured: ~0.125 ms/layer saved at b384/T192).
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    new_cache = None
    kv_quant = cache is not None and cache["k"].dtype == jnp.int8
    k_scale = v_scale = None
    if cache is not None:
        # decode: write new k/v at cache_index, attend over the whole cache.
        # cache_index is a scalar (shared column — the generate() fast path)
        # or a per-row [b] array (continuous-batching server).
        if kv_quant:
            # int8 KV cache: per-(token,head) symmetric quantization. Halves
            # the decode-phase cache read (the #2 HBM stream after weights)
            # and doubles cache capacity; dequantization is folded into the
            # attention math below, never materialized. Scale pools are
            # [b, kv, T] — a trailing singleton dim would be padded to 128
            # lanes on TPU (128× the HBM: ~5.6 GB at 7B b256, an OOM).
            (k, k_s), (v, v_s) = _quantize_kv(k), _quantize_kv(v)
            writes = [("k", k), ("v", v)]
            writes3 = [("k_scale", k_s[..., 0]), ("v_scale", v_s[..., 0])]  # [b, kv, t]
        else:
            writes = [("k", k), ("v", v)]
            writes3 = []
        if getattr(cache_index, "ndim", 0) == 1:
            if t > 1:
                # speculative verify: write t rows per sequence at per-row
                # offsets. A vmapped dynamic_update_slice lowers to a
                # scatter (~0.5 ms/layer at b128 — dominates the verify
                # step); a onehot-masked rewrite streams the cache once at
                # full HBM bandwidth instead.
                cols = cache_index[:, None] + jnp.arange(t)[None, :]  # [b, t]
                onehot = (
                    jnp.arange(cache["k"].shape[2])[None, None, :] == cols[:, :, None]
                )  # [b, t, T]
                hit4 = jnp.any(onehot, axis=1)[:, None, :, None]  # [b, 1, T, 1]
                hit3 = jnp.any(onehot, axis=1)[:, None, :]  # [b, 1, T]
                oh = onehot.astype(jnp.float32)

                def scatter(buf, new):
                    upd = jnp.einsum(
                        "btT,bhtd->bhTd", oh, new.astype(jnp.float32)
                    ).astype(buf.dtype)
                    return jnp.where(hit4, upd, buf)

                def scatter3(buf, new):
                    upd = jnp.einsum("btT,bht->bhT", oh, new.astype(jnp.float32))
                    return jnp.where(hit3, upd.astype(buf.dtype), buf)

                new_cache = {name: scatter(cache[name], new) for name, new in writes}
                new_cache.update(
                    {name: scatter3(cache[name], new) for name, new in writes3}
                )
            else:
                def write_row(buf, new, idx):
                    return jax.lax.dynamic_update_slice_in_dim(buf, new, idx, axis=1)

                new_cache = {
                    name: jax.vmap(write_row)(cache[name], new, cache_index)
                    for name, new in writes + writes3
                }
        else:
            new_cache = {
                name: jax.lax.dynamic_update_slice_in_dim(cache[name], new, cache_index, axis=2)
                for name, new in writes + writes3
            }
        if (
            PREFILL_ATTENTION == "flash"
            and t >= 64
            and not kv_quant
            and getattr(cache_index, "ndim", 0) == 0  # prefill, not verify
            and t % 32 == 0
            and cfg.head_dim in (64, 128)
            and jax.default_backend() == "tpu"
        ):
            # prefill: attend over the LOCAL just-projected k/v (the cache
            # holds nothing beyond them yet; later columns are masked in
            # the XLA path anyway). q/k/v here are pre-write [b, kv, t, d].
            out = _flash_prefill_attention(cfg, q, k, v, mask, t)
            return (
                _lora_dense(layer["o_proj"], lget("o_proj"), out, scaling,
                            has_bias=False),
                new_cache,
                False,
            )
        k, v = new_cache["k"], new_cache["v"]
        if kv_quant:
            k_scale = new_cache["k_scale"]  # [b, kv, max_len]
            v_scale = new_cache["v_scale"]

    groups = cfg.num_heads // cfg.num_kv_heads
    if (
        DECODE_ATTN_O in ("auto", "pallas")
        and fused is not None
        and pre_ln is not None  # x is still the RAW residual stream
        and not kv_quant
        and lora_layer is None
        and "w" in layer["o_proj"]
        and cfg.head_dim % 128 == 0  # q/k/v block trailing dim lane-aligned
        and cache["k"].shape[2] % 8 == 0  # a power-of-2 T block ≥ 8 exists
        and _decode_kernel_backend_ok()
        and (
            DECODE_ATTN_O == "pallas"
            or cfg.num_heads * cfg.head_dim * cfg.hidden_size
            * jnp.dtype(layer["o_proj"]["w"].dtype).itemsize
            <= 12 * 2**20
        )
    ):
        # fused attention back half: QK^T → online softmax → PV → o_proj →
        # residual, one kernel, W_o resident (ops/decode_attn_o_pallas)
        from affectgpt_tpu.ops.decode_attn_o_pallas import decode_attn_o

        key_mask = (mask[:, 0, 0, :] if mask.ndim == 4 else mask[:, 0, :])
        qd = q[:, 0].reshape(b, cfg.num_kv_heads, groups, cfg.head_dim)
        x_new = decode_attn_o(
            x[:, 0, :], qd, k, v, key_mask, layer["o_proj"]["w"],
            interpret=_decode_kernel_interpret(),
        )
        return x_new[:, None, :], new_cache, True
    if (
        DECODE_ATTENTION == "pallas"
        and cache is not None
        and not kv_quant
        and t == 1
        and jax.default_backend() == "tpu"
    ):
        # fused single-kernel decode attention (QK^T → softmax → PV)
        from affectgpt_tpu.ops.decode_attention_pallas import decode_attention_pallas

        key_mask = (mask[:, 0, 0, :] if mask.ndim == 4 else mask[:, 0, :])
        qd = q[:, 0].reshape(b, cfg.num_kv_heads, groups, cfg.head_dim)
        out = decode_attention_pallas(qd, k, v, key_mask)
        out = out.astype(x.dtype).reshape(b, 1, cfg.num_heads * cfg.head_dim)
        return _lora_dense(layer["o_proj"], lget("o_proj"), out, scaling, has_bias=False), new_cache, False

    # GQA without materializing repeated K/V: fold the query-head groups into
    # a 5-D einsum so XLA broadcasts K/V inside the matmul (a jnp.repeat here
    # would read+write the full repeated cache every decode step — the
    # dominant HBM cost at large batch).
    qg = q.reshape(b, t, cfg.num_kv_heads, groups, cfg.head_dim)
    if kv_quant:
        # HBM reads stay int8; convert in-register for the dot, then apply
        # the per-key-row scales OUTSIDE the contractions:
        #   q·(k_int8·s_k) == (q·k_int8)·s_k      (s_k constant over head_dim)
        #   Σ_k p_k·(v_int8_k·s_v_k) == Σ_k (p_k·s_v_k)·v_int8_k
        k = k.astype(qg.dtype)
        v = v.astype(qg.dtype)
    if jax.default_backend() == "cpu" and k.dtype == jnp.bfloat16:
        # the CPU backend cannot execute a bf16×bf16→f32 dot for this
        # contraction pattern (TPU MXU handles it natively)
        qg, k, v = (a.astype(jnp.float32) for a in (qg, k, v))
    logits = jnp.einsum("bqhgd,bhkd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    if kv_quant:
        logits = logits * k_scale[:, :, None, None, :]
    logits = logits / jnp.sqrt(float(cfg.head_dim))
    mask5 = mask[:, :, None, :, :] if mask.ndim == 4 else mask
    logits = jnp.where(mask5, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    if kv_quant:
        probs = probs * v_scale[:, :, None, None, :]
    probs = probs.astype(v.dtype)
    out = jnp.einsum("bhgqk,bhkd->bqhgd", probs, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(b, t, cfg.num_heads * cfg.head_dim)
    return _lora_dense(layer["o_proj"], lget("o_proj"), out, scaling, has_bias=False,
                       drop=_lora_drop(drop_rng, cfg, "o_proj")), new_cache, False


def _mlp(layer, lora_layer, cfg: QwenConfig, x: jnp.ndarray,
         drop_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    scaling = cfg.lora_alpha / cfg.lora_r
    lget = (lambda n: lora_layer[n]) if lora_layer is not None else (lambda n: None)
    if "gateup_proj" in layer:
        assert lora_layer is None, "fused layout serves merged-LoRA weights"
        y = _lora_dense(layer["gateup_proj"], None, x, 0.0, has_bias=False)
        gate, up = jnp.split(y, 2, axis=-1)
    else:
        gate = _lora_dense(layer["gate_proj"], lget("gate_proj"), x, scaling, has_bias=False,
                           drop=_lora_drop(drop_rng, cfg, "gate_proj"))
        up = _lora_dense(layer["up_proj"], lget("up_proj"), x, scaling, has_bias=False,
                         drop=_lora_drop(drop_rng, cfg, "up_proj"))
    return _lora_dense(layer["down_proj"], lget("down_proj"), jax.nn.silu(gate) * up, scaling, has_bias=False,
                       drop=_lora_drop(drop_rng, cfg, "down_proj"))


def forward(
    params: dict,
    cfg: QwenConfig,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    lora: Optional[dict] = None,
    positions: Optional[jnp.ndarray] = None,
    cache: Optional[list] = None,
    cache_index: Optional[jnp.ndarray] = None,
    remat: bool = False,
    last_token_only: bool = False,
    return_hidden: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Optional[list]]:
    """Run the decoder stack.

    dropout_rng: train-mode switch for LoRA dropout (cfg.lora_dropout,
    peft lora_dropout=0.05 in the reference, affectgpt.py:123). None
    (every inference path) = identity, bitwise-identical to before.

    inputs_embeds [b, t, d]; attention_mask:
      - training/prefill: [b, t] validity (causal mask built internally), or
      - decode (cache given): [b, t, max_len] explicit key mask.
    last_token_only: project only the final position through the lm_head
    (prefill — only the next-token logits are consumed; skips a [b·t, vocab]
    matmul and the fp32 logits HBM traffic).
    return_hidden: skip the lm_head and return the final-LN hidden states
    [b, t, d] instead of logits (the fused_cross_entropy_loss training path).
    Returns (logits [b, t, vocab] or [b, 1, vocab], new_cache or None).
    """
    b, t, _ = inputs_embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))

    if cache is None:
        causal = jnp.tril(jnp.ones((t, t), dtype=bool))
        mask = causal[None, None, :, :] & attention_mask[:, None, None, :].astype(bool)
    else:
        mask = attention_mask[:, None, :, :]  # [b, 1, t, max_len]

    x = inputs_embeds
    new_cache = [] if cache is not None else None

    def layer_fn(x, layer, lora_layer, layer_cache, layer_drop_rng):
        attn_out, updated, residual_done = _attention(
            layer, lora_layer, cfg, x, positions, mask, layer_cache,
            cache_index, pre_ln=layer["input_ln"], drop_rng=layer_drop_rng,
        )
        # the fused attn+o kernel already added the residual stream
        x = attn_out if residual_done else x + attn_out
        y = (
            _decode_mlp_fused(layer, lora_layer, cfg, x)
            if layer_cache is not None and t == 1
            else None
        )
        if y is not None:
            x = y
        else:
            h = nn.rmsnorm(layer["post_attn_ln"], x, cfg.rms_eps)
            x = x + _mlp(layer, lora_layer, cfg, h, drop_rng=layer_drop_rng)
        return x, updated

    if remat:
        # remat=True: full per-layer rematerialization (minimum memory —
        # backward re-runs the whole layer forward). remat="dots": save
        # every non-batched matmul output (q/k/v/o/gate/up/down — the
        # attention einsums carry batch dims and are NOT saved), so the
        # backward only recomputes cheap elementwise work; trades
        # ~110 MB/layer at 3B b8 t256 for skipping ~1/3 of the step FLOPs.
        policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if remat == "dots"
            else None
        )
        layer_fn = jax.checkpoint(layer_fn, static_argnums=(), policy=policy)

    # AFFECTGPT_LAYER_BARRIER=1: pin layer boundaries with an
    # optimization_barrier so XLA's scheduler cannot keep many layers'
    # prefill activations live at once — the int8-KV 7B serving config
    # OOMs on exactly that HLO-temp high-water doubling (scheduler
    # artifact; see CLAUDE.md int8-KV notes)
    import os as _os

    barrier = _os.environ.get("AFFECTGPT_LAYER_BARRIER", "0") == "1"
    drop_on = dropout_rng is not None and lora is not None and cfg.lora_dropout > 0.0
    for i, layer in enumerate(params["layers"]):
        lora_layer = lora["layers"][i] if lora is not None else None
        layer_cache = cache[i] if cache is not None else None
        layer_drop = jax.random.fold_in(dropout_rng, i) if drop_on else None
        x, updated = layer_fn(x, layer, lora_layer, layer_cache, layer_drop)
        if barrier:
            if updated is not None:
                x, updated = jax.lax.optimization_barrier((x, updated))
            else:
                x = jax.lax.optimization_barrier(x)
        if new_cache is not None:
            new_cache.append(updated)

    x = nn.rmsnorm(params["final_ln"], x, cfg.rms_eps)
    if last_token_only:
        x = x[:, -1:, :]
    if return_hidden:
        return x, new_cache
    if cfg.tie_embeddings:
        logits = jnp.dot(
            x, params["embed_tokens"]["table"].T, preferred_element_type=jnp.float32
        )
    elif "w" not in params["lm_head"]:  # quantized (w_q int8 / w_q4 int4)
        logits = _lora_dense(params["lm_head"], None, x, 0.0, has_bias=False).astype(
            jnp.float32
        )
    else:
        logits = jnp.dot(x, params["lm_head"]["w"], preferred_element_type=jnp.float32)
    return logits, new_cache


def embed_tokens(params: dict, ids: jnp.ndarray) -> jnp.ndarray:
    return nn.embedding(params["embed_tokens"], ids)


def init_cache(cfg: QwenConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> list:
    """KV cache in [b, kv_heads, max_len, head_dim] layout (time on the
    sublane-adjacent axis): decode attention contracts head_dim with batch
    dims (b, h) leading on both operands — no per-step cache transpose.

    dtype=jnp.int8 selects the quantized cache: int8 values plus per-row
    float32 scales ("k_scale"/"v_scale", [b, kv, max_len] — NO trailing
    singleton: TPU pads the minor dim to 128 lanes, so a [..., 1] layout
    would cost 128× the HBM). Halves the decode-phase cache HBM read and
    doubles the token capacity per byte; dequantization is folded into
    the attention einsums in _attention."""
    shape = (batch, cfg.num_kv_heads, max_len, cfg.head_dim)

    def layer_buf():
        # fresh arrays per layer: callers (inference/server.py) donate the
        # cache into jitted updates, and XLA rejects aliased donated buffers
        buf = {"k": jnp.zeros(shape, dtype=dtype), "v": jnp.zeros(shape, dtype=dtype)}
        if dtype == jnp.int8:
            buf["k_scale"] = jnp.zeros(shape[:3], dtype=jnp.float32)
            buf["v_scale"] = jnp.zeros(shape[:3], dtype=jnp.float32)
        return buf

    return [layer_buf() for _ in range(cfg.num_layers)]


def cross_entropy_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = -100
) -> jnp.ndarray:
    """Shifted causal-LM loss with ignore-index masking, mean over valid
    positions (the HF labels= semantics the reference relies on)."""
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logprobs = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logprobs, safe_labels[..., None], axis=-1)[..., 0]
    loss_sum = -jnp.sum(jnp.where(valid, token_ll, 0.0))
    return loss_sum / jnp.maximum(jnp.sum(valid), 1)


def fused_cross_entropy_loss(
    hidden: jnp.ndarray,
    params: dict,
    cfg: QwenConfig,
    labels: jnp.ndarray,
    ignore_index: int = -100,
    chunk: int = 16384,
) -> jnp.ndarray:
    """Shifted causal-LM loss computed by streaming the lm_head over vocab
    CHUNKS with an online logsumexp — the full [b, t, vocab] fp32 logits
    tensor never materializes (it is the train-step OOM at batch ≥ 16:
    b16·t256·v151936·4B ≈ 2.4 GB live through the backward).

    hidden [b, t, d] = forward(..., return_hidden=True); numerically
    identical to cross_entropy_loss(lm_head(hidden), labels) up to fp32
    reduction order. Each chunk is rematerialized in the backward
    (jax.checkpoint), so the live set is one [N, chunk] block + the
    [N, d] gradient accumulator. Reference semantics: HF labels= CE,
    my_affectgpt/models/affectgpt.py:924-1028 {"loss"}.
    """
    b, t, d = hidden.shape
    xs = hidden[:, :-1, :].reshape(-1, d)
    lab = labels[:, 1:].reshape(-1)
    n = xs.shape[0]
    valid = lab != ignore_index
    safe = jnp.where(valid, lab, 0)

    if cfg.tie_embeddings:
        table = params["embed_tokens"]["table"]  # [V, d]
        vocab = table.shape[0]
        get_chunk = lambda off, width: jax.lax.slice(  # noqa: E731
            table, (off, 0), (off + width, d)
        ).T  # [d, width]
    else:
        w = params["lm_head"]["w"]  # [d, V]
        vocab = w.shape[1]
        get_chunk = lambda off, width: jax.lax.slice(  # noqa: E731
            w, (0, off), (d, off + width)
        )

    def make_chunk_stats(off: int, width: int):
        # off/width stay Python-static (lax.slice needs static bounds);
        # checkpoint reruns the chunk matmul in the backward instead of
        # keeping [N, width] fp32 residuals live per chunk
        @jax.checkpoint
        def chunk_stats(m, s, tgt):
            logits = jnp.dot(
                xs, get_chunk(off, width), preferred_element_type=jnp.float32
            )
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
            s = s * jnp.exp(m - m_new) + jnp.sum(
                jnp.exp(logits - m_new[:, None]), axis=-1
            )
            in_chunk = (safe >= off) & (safe < off + width)
            picked = jnp.take_along_axis(
                logits, jnp.clip(safe - off, 0, width - 1)[:, None], axis=-1
            )[:, 0]
            tgt = tgt + jnp.where(in_chunk, picked, 0.0)
            return m_new, s, tgt

        return chunk_stats

    m = jnp.full((n,), -jnp.inf, jnp.float32)
    s = jnp.zeros((n,), jnp.float32)
    tgt = jnp.zeros((n,), jnp.float32)
    for off in range(0, vocab, chunk):
        m, s, tgt = make_chunk_stats(off, min(chunk, vocab - off))(m, s, tgt)

    token_nll = jnp.log(s) + m - tgt
    loss_sum = jnp.sum(jnp.where(valid, token_nll, 0.0))
    return loss_sum / jnp.maximum(jnp.sum(valid), 1)
