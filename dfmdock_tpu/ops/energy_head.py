"""Pallas TPU kernel: fused pair-energy head.

energy = masked_mean over (i, j) of  W2 . silu(LN(hr_i + hl_j))
(score_net_mlsb.py:289-294,386-390 with the first Linear pre-split into
hr = h @ W[:C], hl = h @ W[C:] outside).

The XLA row-chunk scan costs ~7 ms per 16-pose forward (materializes
[chunk, N, C] LN/silu temps in HBM); here each row-block's whole chain stays
in VMEM.  The pair tensor is [BN, N, C] with N a multiple of 128, so the
[BN*N, C] reshape for the MXU dot is layout-trivial (unlike K=60 in the EGCL
kernel).  Outputs per block: masked sum + mask count; the mean is taken
outside.  Inference-only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 8
LN_EPS = 1e-5


def _interpret():
    return jax.default_backend() != "tpu"


def _kernel(hr_ref, hl_ref, mask_ref, g_ref, b_ref, w2_ref, acc_ref):
    bn, c = hr_ref.shape
    n = hl_ref.shape[0]
    pair = hr_ref[:][:, None, :] + hl_ref[:][None, :, :]  # [BN, N, C]
    mean = pair.mean(-1, keepdims=True)
    var = ((pair - mean) ** 2).mean(-1, keepdims=True)
    y = (pair - mean) * jax.lax.rsqrt(var + LN_EPS) * g_ref[:] + b_ref[:]
    y = jax.nn.silu(y)
    # width-1 output: a VPU multiply-reduce beats a degenerate MXU dot
    # (Mosaic also rejects vector-rhs dot_general)
    e = (y * w2_ref[:][None, None, :]).sum(-1)  # [BN, N]
    m = mask_ref[:]

    # accumulate across sequential grid steps into one VMEM tile:
    # row 0 holds the masked energy sum, row 1 the mask count
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    r = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    upd = jnp.where((r == 0) & (cc == 0), (e * m).sum(), 0.0) + jnp.where(
        (r == 1) & (cc == 0), m.sum(), 0.0
    )
    acc_ref[:] += upd


def fused_energy(hr, hl, pair_mask, ln_g, ln_b, w2):
    """hr, hl: [N, C] pre-split halves; pair_mask [N, N]; w2 [C].
    Returns the masked mean energy (scalar, +1e-6 denominator like the
    reference)."""
    n, c = hr.shape
    grid = (n // BLOCK_N,)
    row = lambda *shape: pl.BlockSpec(
        (BLOCK_N,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM
    )
    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    acc = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            row(c),       # hr rows
            full(n, c),   # hl
            row(n),       # pair mask rows
            full(c), full(c),  # LN gamma/beta
            full(c),      # w2
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=_interpret(),
    )(hr, hl, pair_mask, ln_g, ln_b, w2)
    return acc[0, 0] / (acc[1, 0] + 1e-6)
