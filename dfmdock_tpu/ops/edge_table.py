"""Pallas TPU kernel: build the packed [16, E] edge table in one pass.

Replaces the XLA-side per-step featurize of the fast inference path —
`sixd_bins_at` (trRosetta 6D bins, features/sixd.py), `relpos_bin_at`
(AF2-multimer relpos class, features/positional.py), the EGNN coord-diff /
radial geometry, and `pack_edge_table` — with a single kernel that writes the
[ROWS, E] table `ops/fused_egcl.py` consumes.  Reference semantics:
src/utils/coords6d.py:23-103, src/models/score_net_mlsb.py:30-59,
src/utils/crop.py:9-49, src/models/egnn.py:139-148.

Why a round-major rewrite works where the parked `ops/edge_bins.py` failed:
that kernel held 3-vectors as [E, 3] COLUMNS and Mosaic rejected the
in-kernel cross products ("offset mismatch on non-concat dimension"), while
its five [E, 1] outputs paid the minor-dim-1 128x tile tax (NOTES.md round
3).  Here every per-edge quantity lives in LANES: 3-vectors are python
tuples of [1, E] rows, so cross products / dots / norms are plain row-wise
VPU ops with no reshapes, no minor-dim-1 tensors, and nothing for the
layout checker to reject; the node gathers are the same stacked one-hot
matmuls the layer kernels use ([16, N] @ [N, E] with a 3-term bf16 split,
exact to ~2^-27 — ops/gather.py's trick, so the gather itself cannot flip a
bin).

atan2/arccos are not lowered by Mosaic; the minimax arctan polynomial
(max err ~2e-7 rad, ~1e-5 deg — angle bins are 15 deg wide) provides them.
NOTE on exactness: bin boundaries come from the same jnp.linspace
computation as features/sixd._get_bins (bit-identical constants), but the
polynomial trig means an angle within ~1e-5 deg of a boundary can land one
bin off vs the XLA path — measure-zero on real geometry, and parity-gated
per-row in tests/test_edge_table.py and scripts/hw_parity.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfmdock_tpu.features.positional import MAX_RELATIVE_IDX
from dfmdock_tpu.features.sixd import (
    NUM_DIST_BINS,
    NUM_OMEGA_BINS,
    NUM_PHI_BINS,
    NUM_THETA_BINS,
    SPATIAL_MASK_CUTOFF,
    virtual_cb,
)
from dfmdock_tpu.ops.gather import split_bf16_3
from dfmdock_tpu.ops.fused_egcl import (
    R_CD,
    R_DB,
    R_IDX,
    R_MASK,
    R_OB,
    R_PB,
    R_RAD,
    R_RP,
    R_TB,
    ROWS,
    block_n,
)

_DEG = 180.0 / math.pi

# node-geometry table row layout ([NODE_ROWS, N] f32).  The j-side gather
# needs only rows 0..7 (one f32 sublane tile, half the matmul of the full
# table); the i-side rows 8..11 ride the same table via the block slice.
_CA, _CB = 0, 3  # xyz triples
_RID, _AID = 6, 7
_N_AT, _ROW = 8, 11
J_ROWS = 8
NODE_ROWS = 16

IN_ROWS = 8  # input per-edge rows: [idx | mask | pad...] (full f32 tile)


def _interpret():
    return jax.default_backend() != "tpu"


def _split3_xla(x):
    """f32 -> three exactly-representable bf16 terms (hi + mid + lo).

    Round-4 hardware finding: BOTH Mosaic (in-kernel) and XLA-on-TPU elide a
    convert-based `x - f32(bf16(x))` under excess-precision folding — the
    residuals come back exactly zero and the gathered node geometry silently
    truncates to single bf16 (measured: rad off on ALL edges, max |d_dist|
    0.48 A, ~1425/23700 distance-bin flips on 1AVX).  ops/gather.split_bf16_3
    masks the low mantissa bits with integer bitcasts instead, which no
    precision pass can fold; hw-gated by scripts/hw_parity.py."""
    return split_bf16_3(x)


def _gather_dot(vals3, oh, rows):
    """Pre-split [3*rows, E-side M] bf16 @ [M, E] one-hot -> [rows, E] f32,
    exact to ~2^-27 (hi/mid/lo terms stacked on the sublane dim)."""
    d = lambda a: jax.lax.dot_general(
        a, oh, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (d(vals3[0:rows]) + d(vals3[rows : 2 * rows])
            + d(vals3[2 * rows : 3 * rows]))


def _gather_dot_t(vals3, oh, rows):
    """Pre-split [M, 3*rows] bf16 (row-major node block) x [M, E] one-hot
    -> [rows, E] f32.

    Contraction on dim 0 of BOTH operands — the lhs-T layout Mosaic lowers
    natively at full MXU rate (NOTES.md round 3, finding 2).  hi/mid/lo
    terms stacked on the LANE dim of the transposed block."""
    d = lambda a: jax.lax.dot_general(
        a, oh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (d(vals3[:, 0:rows]) + d(vals3[:, rows : 2 * rows])
            + d(vals3[:, 2 * rows : 3 * rows]))


# ----- 3-vectors as tuples of [1, E] rows: pure row-wise VPU ops -----------


def _vec(m, r):
    """Rows r..r+2 of [R, E] as a 3-tuple of [1, E]."""
    return (m[r : r + 1, :], m[r + 1 : r + 2, :], m[r + 2 : r + 3, :])


def _vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _vunit(a):
    inv = jax.lax.rsqrt(jnp.maximum(_vdot(a, a), 1e-30))
    return _vscale(a, inv)


# ----- scalar transcendentals (Mosaic lowers neither atan2 nor arccos) -----


def _atan_poly(z):
    """Minimax atan(z) on |z| <= 1 (max err ~2e-7 rad)."""
    z2 = z * z
    p = -0.0040540580
    for c in (0.0218612288, -0.0559098861, 0.0964200441, -0.1390853351,
              0.1994653599, -0.3332985605, 0.9999993329):
        p = p * z2 + c
    return z * p


def _atan2(y, x):
    ax, ay = jnp.abs(x), jnp.abs(y)
    swap = ay > ax
    a = _atan_poly(jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-30))
    a = jnp.where(swap, jnp.pi / 2 - a, a)
    a = jnp.where(x < 0, jnp.pi - a, a)
    return jnp.where(y < 0, -a, a)


def _acos(z):
    z = jnp.clip(z, -1.0, 1.0)
    return _atan2(jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0)), z)


@functools.lru_cache(maxsize=None)
def _boundaries(lo, hi, nb):
    """The exact f32 boundary values features/sixd._get_bins compares
    against: the same jnp.linspace computation, evaluated once on the CPU
    backend (f32 IEEE add/mul/div — backend-independent), so the kernel's
    static comparisons use bit-identical constants (ADVICE r3)."""
    # ensure_compile_time_eval: this helper is called during the pallas
    # kernel trace, where a bare jnp.linspace would become a tracer
    with jax.ensure_compile_time_eval(), jax.default_device(
        jax.local_devices(backend="cpu")[0]
    ):
        return tuple(
            np.asarray(jnp.linspace(lo, hi, nb - 1), np.float32).tolist()
        )


def _bins_row(x, lo, hi, nb):
    """sum(x > linspace(lo, hi, nb-1)) as nb-1 static comparisons on [1, E]
    (boundary constants fold at trace time; features/sixd._get_bins
    semantics — NaN-free inputs here, degenerate edges are mask-zeroed)."""
    out = jnp.zeros_like(x)
    for b in _boundaries(lo, hi, nb):
        out = out + (x > b).astype(jnp.float32)
    return out


def _dihedral_deg(a, b, c, d):
    """Dihedral at b-c in degrees; row-tuple formulation of coords6d.py:23-43."""
    b1, b2, b3 = _vsub(a, b), _vsub(b, c), _vsub(c, d)
    n1 = _vunit(_vcross(b1, b2))
    n2 = _vunit(_vcross(b2, b3))
    m1 = _vcross(n1, _vunit(b2))
    return _atan2(_vdot(m1, n2), _vdot(n1, n2)) * _DEG


def _kernel(inp_ref, nb_ref, nf_ref, out_ref, *, k: int, normalize: bool):
    n = nf_ref.shape[1]
    bn = nb_ref.shape[0]  # i-side block arrives TRANSPOSED: [BN, 3*NODE_ROWS]
    e = inp_ref.shape[1]

    idx = inp_ref[0:1, :]   # [1, E] f32 (exact small ints)
    mask = inp_ref[1:2, :]  # [1, E]

    # j-side gather: one-hot against the node table's first sublane tile
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, e), 0).astype(jnp.float32)
    oh_j = (iota_n == idx).astype(jnp.bfloat16)  # [N, E]
    jv = _gather_dot(nf_ref[:], oh_j, J_ROWS)  # [J_ROWS, E]

    # i-side broadcast: i = e // K against the block's node rows
    iota_bn = jax.lax.broadcasted_iota(jnp.int32, (bn, e), 0)
    e_over_k = jax.lax.broadcasted_iota(jnp.int32, (bn, e), 1) // k
    oh_i = (iota_bn == e_over_k).astype(jnp.bfloat16)  # [BN, E]
    # [BN, 3*NODE_ROWS] x [BN, E] -> [NODE_ROWS, E]
    iv = _gather_dot_t(nb_ref[:], oh_i, NODE_ROWS)

    n_i, ca_i, cb_i = _vec(iv, _N_AT), _vec(iv, _CA), _vec(iv, _CB)
    ca_j, cb_j = _vec(jv, _CA), _vec(jv, _CB)
    rid_i, aid_i = iv[_RID : _RID + 1, :], iv[_AID : _AID + 1, :]
    rid_j, aid_j = jv[_RID : _RID + 1, :], jv[_AID : _AID + 1, :]
    row_i = iv[_ROW : _ROW + 1, :]

    # EGNN coord geometry (egnn.py:139-148): raw squared CA distance + the
    # (optionally normalized) coord-diff rows shared by all layer kernels
    diff = _vsub(ca_i, ca_j)
    rad = _vdot(diff, diff)  # [1, E]
    dist = jnp.sqrt(jnp.maximum(rad, 1e-12))
    cdn = (
        _vscale(diff, 1.0 / (jnp.sqrt(rad + 1e-8) + 1.0)) if normalize else diff
    )

    # trRosetta 6D angles (coords6d.py:62-103)
    omega = _dihedral_deg(ca_i, cb_i, cb_j, ca_j)
    theta = _dihedral_deg(n_i, ca_i, cb_i, cb_j)
    v1, v2 = _vsub(ca_i, cb_i), _vsub(cb_j, cb_i)
    cosp = _vdot(v1, v2) * jax.lax.rsqrt(
        jnp.maximum(_vdot(v1, v1) * _vdot(v2, v2), 1e-30)
    )
    phi = _acos(cosp) * _DEG

    db = _bins_row(dist, 3.25, 50.75, NUM_DIST_BINS)
    ob = _bins_row(omega, -180.0, 180.0, NUM_OMEGA_BINS)
    tb = _bins_row(theta, -180.0, 180.0, NUM_THETA_BINS)
    pb = _bins_row(phi, 0.0, 180.0, NUM_PHI_BINS)

    # angle bins zeroed at dist >= 22 A or i == j (sixd._bin_pairs)
    keep = ((dist < SPATIAL_MASK_CUTOFF) & (idx != row_i)).astype(jnp.float32)
    ob, tb, pb = ob * keep, tb * keep, pb * keep

    # AF2 relpos class (positional.relpos_bin_at)
    clipped = jnp.clip(
        rid_i - rid_j + MAX_RELATIVE_IDX, 0.0, 2.0 * MAX_RELATIVE_IDX
    )
    same_chain = jnp.abs(aid_i - aid_j) < 0.5
    rp = jnp.where(same_chain, clipped, 2.0 * MAX_RELATIVE_IDX + 1.0)

    zero = jnp.zeros_like(idx)
    rows = [None] * ROWS
    rows[R_IDX], rows[R_MASK] = idx, mask
    rows[R_DB], rows[R_OB], rows[R_TB], rows[R_PB] = db, ob, tb, pb
    rows[R_RP], rows[R_RAD] = rp, rad
    rows[R_CD], rows[R_CD + 1], rows[R_CD + 2] = cdn
    out_ref[:] = jnp.concatenate(
        [r if r is not None else zero for r in rows], axis=0
    )


def node_geometry_table(pos, res_id, asym_id):
    """[N, 3, 3] backbone + ids -> the [NODE_ROWS, N] f32 node table
    (rows: N/CA/virtual-CB xyz, res_id, asym_id, row index)."""
    n = pos.shape[0]
    rows = jnp.concatenate(
        [
            pos[:, 1, :],  # CA (j-tile)
            virtual_cb(pos),  # CB (j-tile)
            res_id.astype(jnp.float32)[:, None],  # rid (j-tile)
            asym_id.astype(jnp.float32)[:, None],  # aid (j-tile)
            pos[:, 0, :],  # N (i-side only)
            jnp.arange(n, dtype=jnp.float32)[:, None],  # row (i-side only)
        ],
        axis=-1,
    ).T  # [12, N]
    return jnp.pad(rows, ((0, NODE_ROWS - rows.shape[0]), (0, 0)))


def build_edge_table(idx, edge_mask, pos, res_id, asym_id, *, normalize: bool):
    """One Pallas pass from the selected neighbour set to the packed table.

    Args:
      idx: [N, K] int32 neighbour indices; edge_mask: [N, K] f32 validity.
      pos: [N, 3, 3] backbone N/CA/C coords (pre-stop-gradient).
      res_id / asym_id: [N] int32.
      normalize: EGNN coord-diff normalization flag (ModelConfig.normalize).

    Returns [ROWS, N*K] f32 — drop-in for ops/fused_egcl.pack_edge_table.
    Rows of MASKED edges may differ from the XLA featurize (guarded math vs
    NaN propagation on degenerate geometry); every consumer folds edge_mask
    into its segment-sum, so final outputs are identical.
    """
    n, k = idx.shape
    e = n * k
    inp = jnp.pad(
        jnp.stack(
            [idx.reshape(e).astype(jnp.float32), edge_mask.reshape(e)]
        ),
        ((0, IN_ROWS - 2), (0, 0)),
    )
    node_tab = node_geometry_table(pos, res_id, asym_id)
    # 3-term bf16 split in XLA (NOT in-kernel — see _split3_xla): the kernel
    # receives hi/mid/lo stacked on sublanes (j-side, first J_ROWS of each
    # term) and on lanes (i-side transposed block)
    hi, mid, lo = _split3_xla(node_tab)
    nf3 = jnp.concatenate([hi[:J_ROWS], mid[:J_ROWS], lo[:J_ROWS]], 0)
    nb3 = jnp.concatenate([hi, mid, lo], 0).T  # [N, 3*NODE_ROWS] bf16

    bn = block_n(n)
    e_blk = bn * k
    tab_spec = lambda r: pl.BlockSpec(
        (r, e_blk), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel, k=k, normalize=normalize),
        grid=(n // bn,),
        in_specs=[
            tab_spec(IN_ROWS),
            # i-side node block rides TRANSPOSED ([N, 3*NODE_ROWS], block
            # (bn, 3*NODE_ROWS)): bn must live on the SUBLANE dim — Mosaic
            # requires lane-dim blocks to be x128 or the full dim, and
            # block_n returns 64 for the n%128==64 buckets (448, ...).
            pl.BlockSpec(
                (bn, 3 * NODE_ROWS), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3 * J_ROWS, n), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tab_spec(ROWS),
        out_shape=jax.ShapeDtypeStruct((ROWS, e), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(inp, nb3, nf3)
