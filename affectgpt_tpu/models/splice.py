"""Static-shape multimodal embedding splice.

The reference splices modality embeddings into the token-embedding
sequence with a per-sample Python loop over patch-token positions
(reference: my_affectgpt/models/affectgpt.py:967-1009). That pattern is
hostile to XLA (data-dependent control flow, per-sample concat), so here
the splice is a batched dynamic_update_slice: patch-token runs are
located once at tokenization time on the host (they are knowable there —
the collator emits one int32 offset per modality per sample, -1 when the
modality is absent), and the device op is a vmapped fixed-width window
write. One fused kernel, no gathers over the vocabulary dimension.

Invariants (validated host-side in data/collation.py, mirroring the
reference's hot-path asserts affectgpt.py:995-1002): each present
modality has exactly `num_query_tokens` consecutive patch tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def splice_embeddings(
    inputs_embeds: jnp.ndarray,
    modality_embeds: jnp.ndarray,
    offsets: jnp.ndarray,
) -> jnp.ndarray:
    """Write modality_embeds [b, q, d] into inputs_embeds [b, t, d] at
    per-sample start positions offsets [b] (int32; -1 = modality absent
    for the whole batch entry → row left untouched)."""

    def one(embeds, mod, off):
        start = jnp.maximum(off, 0)
        updated = jax.lax.dynamic_update_slice(embeds, mod.astype(embeds.dtype), (start, 0))
        return jnp.where(off >= 0, updated, embeds)

    return jax.vmap(one)(inputs_embeds, modality_embeds, offsets)


def find_patch_run(input_ids, patch_token_id: int, num_query_tokens: int) -> int:
    """Host-side: locate the patch-token run for one sample, enforcing the
    reference's count/consecutiveness invariants. Returns start offset or
    -1 when the token does not appear."""
    import numpy as np

    ids = np.asarray(input_ids)
    positions = np.where(ids == patch_token_id)[0]
    if positions.size == 0:
        return -1
    if positions.size != num_query_tokens:
        raise ValueError(
            f"Patch token {patch_token_id} appears {positions.size} times, "
            f"expected {num_query_tokens}"
        )
    if not np.array_equal(positions, np.arange(positions[0], positions[0] + num_query_tokens)):
        raise ValueError(f"Patch tokens for {patch_token_id} are not consecutive")
    return int(positions[0])
