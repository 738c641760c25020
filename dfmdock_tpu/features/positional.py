"""AF2-multimer relative positional encoding (66-way), as integer bins.

Matches reference src/utils/crop.py:9-49 / inference_base.py:252-292: offsets
clipped to +-32 within a chain (65 classes) plus one cross-chain class, then
one-hot(66).  Here the class index is returned directly; one_hot @ W becomes
W[index] downstream.
"""
from __future__ import annotations

import jax.numpy as jnp

MAX_RELATIVE_IDX = 32
NUM_RELPOS_CLASSES = 2 * MAX_RELATIVE_IDX + 2  # 66


def relpos_bin(res_id: jnp.ndarray, asym_id: jnp.ndarray) -> jnp.ndarray:
    """[N] res ids + [N] chain ids -> [N, N] int32 class in [0, 65]."""
    same_chain = asym_id[:, None] == asym_id[None, :]
    offset = res_id[:, None] - res_id[None, :]
    clipped = jnp.clip(offset + MAX_RELATIVE_IDX, 0, 2 * MAX_RELATIVE_IDX)
    return jnp.where(same_chain, clipped, 2 * MAX_RELATIVE_IDX + 1).astype(jnp.int32)


def relpos_bin_at(res_id, asym_id, idx):
    """Variant at selected neighbors: idx [N, K] -> [N, K] int32."""
    from dfmdock_tpu.ops.gather import gather_rows

    rj = gather_rows(
        jnp.stack([res_id, asym_id], -1).astype(jnp.float32), idx
    )
    res_j = jnp.round(rj[..., 0]).astype(jnp.int32)
    asym_j = jnp.round(rj[..., 1]).astype(jnp.int32)
    same_chain = asym_id[:, None] == asym_j
    offset = res_id[:, None] - res_j
    clipped = jnp.clip(offset + MAX_RELATIVE_IDX, 0, 2 * MAX_RELATIVE_IDX)
    return jnp.where(same_chain, clipped, 2 * MAX_RELATIVE_IDX + 1).astype(jnp.int32)


def relpos_onehot(res_id, asym_id):
    """Dense [N, N, 66] float one-hot (converter/tests parity helper)."""
    bins = relpos_bin(res_id, asym_id)
    return jnp.eye(NUM_RELPOS_CLASSES, dtype=jnp.float32)[bins]
