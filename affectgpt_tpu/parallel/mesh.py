"""Device mesh and sharding rules.

TPU-native replacement for the reference's DDP/NCCL layer (reference:
my_affectgpt/common/dist_utils.py:54-79, runner_base.py:103-109): instead
of wrapping a module and all-reducing grads, we lay out a 2-D
("dp", "tp") jax.sharding.Mesh, annotate parameter and batch shardings,
and let GSPMD insert the collectives over ICI. The reference supports DP
only (SURVEY §2.5); tp is available here as a free extra for throughput
on >1-chip slices and defaults to 1.

Sharding policy (scaling-book style):
- Batch dims: P("dp").
- LLM column-parallel matmuls (q/k/v, gate/up): weights P(None, "tp"),
  biases P("tp").
- LLM row-parallel matmuls (o, down): weights P("tp", None) — XLA emits
  the psum after the pair.
- lm_head: P(None, "tp") (vocab-sharded logits; softmax collectives
  inserted by the compiler).
- LoRA A replicated (skinny), LoRA B sharded like the base output dim.
- Embeddings, norms, mergers, encoders: replicated (small / frozen
  bandwidth-bound weights; encoders are batch-parallel through dp).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices=None, dp: Optional[int] = None, tp: int = 1) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"dp({dp})·tp({tp}) != devices({n})"
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


_COL_PARALLEL = re.compile(r"(q_proj|k_proj|v_proj|gate_proj|up_proj)")
_ROW_PARALLEL = re.compile(r"(o_proj|down_proj)")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_spec(path, leaf) -> P:
    """PartitionSpec for one parameter leaf, by tree path."""
    name = _path_str(path)
    ndim = leaf.ndim
    if "lora" in name:
        # a: [in, r] replicated; b: [r, out] shard out if base out is sharded
        if name.endswith("/a"):
            return P()
        if name.endswith("/b") and _COL_PARALLEL.search(name):
            return P(None, "tp")
        return P()
    if "lm_head" in name and ndim == 2:
        return P(None, "tp")
    if _COL_PARALLEL.search(name):
        if ndim == 2:
            return P(None, "tp")
        if ndim == 1:
            return P("tp")
    if _ROW_PARALLEL.search(name) and ndim == 2:
        return P("tp", None)
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding tree matching `params` structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)), params
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def batch_shardings(mesh: Mesh, batch):
    """Shard every array leaf on its leading (batch) axis."""
    return jax.tree.map(lambda _: batch_sharding(mesh), batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    return jax.device_put(params, param_shardings(mesh, params))
