"""ScoreNet — the mlsb-lineage score network (flagship; owns the shipped
checkpoints' architecture).

Re-design of reference src/models/score_net_mlsb.py:249-449 for TPU:

- padded complexes: one combined [N] node axis (receptor rows then ligand
  rows then padding), with `node_mask` (validity) and `lig_mask`
  (valid-ligand) threaded through every reduction;
- edge features via integer-bin table lookups at the K selected neighbours
  (exactly one-hot @ W — see features.sixd);
- the R x L energy head runs as a lax.scan over row chunks so the [R, L, C]
  intermediate never materializes;
- dedx = -dE/d(lig CA) is jax.grad of the same pure function (second-order
  ready for the energy-conservation training loss).

Batch contract (all padded to static N, rec rows first):
  x:         [N, lm_embed_dim] node features (ESM(+)one-hot)
  pos:       [N, 3, 3] backbone N/CA/C coords
  node_mask: [N] bool
  lig_mask:  [N] float32 — 1.0 for *valid* ligand rows, else 0.0
  res_id:    [N] int32 original residue indices (for relpos)
  asym_id:   [N] int32 chain id (0 receptor, 1 ligand)
  t:         [] float32 diffusion time
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dfmdock_tpu.config import ModelConfig
from dfmdock_tpu.features.positional import NUM_RELPOS_CLASSES, relpos_bin_at
from dfmdock_tpu.features.sixd import (
    SPATIAL_DIM,
    pairwise_ca_dist,
    sixd_bins_at,
    spatial_embed_from_bins,
)
from dfmdock_tpu.models import modules as nn
from dfmdock_tpu.models.edges import select_edges_dispatch
from dfmdock_tpu.models.egnn import (
    build_edge_table_xla,
    egnn_apply,
    egnn_apply_fused,
    egnn_init,
)

ENERGY_ROW_CHUNK = 64  # padded N must be a multiple of this


class ScoreNet:
    """Pure-functional model: `params = ScoreNet(cfg).init(key)`;
    `out = net.apply(params, batch, key, ...)`."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.dtype = None if cfg.compute_dtype == "float32" else jnp.dtype(cfg.compute_dtype)

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array):
        c = self.cfg
        ks = jax.random.split(key, 13)
        params = {
            "single_embed": nn.linear_init(ks[0], c.lm_embed_dim, c.node_dim, bias=False),
            # stored as [bins, edge_dim] lookup tables == the reference's
            # Linear(spatial/positional -> edge_dim, bias=False) weights
            "spatial_embed": nn.linear_init(ks[1], SPATIAL_DIM, c.edge_dim, bias=False),
            "positional_embed": nn.linear_init(
                ks[2], NUM_RELPOS_CLASSES, c.edge_dim, bias=False
            ),
            "egnn": egnn_init(ks[3], c.node_dim, c.edge_dim, c.depth),
            "to_energy": {
                "l0": nn.linear_init(ks[4], 2 * c.node_dim, c.node_dim, bias=False),
                "ln": nn.layer_norm_init(c.node_dim),
                "l1": nn.linear_init(ks[5], c.node_dim, 1, bias=False),
            },
            "to_ires": {
                "l0": nn.linear_init(ks[6], c.node_dim, 2 * c.node_dim),
                "l1": nn.linear_init(ks[7], 2 * c.node_dim, 2 * c.node_dim),
                "l2": nn.linear_init(ks[8], 2 * c.node_dim, 1),
            },
            "t_embed": {
                **nn.gaussian_fourier_init(ks[9], c.inner_dim),
                "l0": nn.linear_init(ks[12], c.inner_dim, c.inner_dim, bias=False),
            },
            "tr_scale": self._scale_mlp_init(ks[10]),
            "rot_scale": self._scale_mlp_init(ks[11]),
        }
        return params

    def _scale_mlp_init(self, key):
        c = self.cfg
        k0, k1 = jax.random.split(key)
        return {
            "l0": nn.linear_init(k0, c.inner_dim + 1, c.inner_dim, bias=False),
            "ln": nn.layer_norm_init(c.inner_dim),
            "l1": nn.linear_init(k1, c.inner_dim, 1, bias=False),
        }

    # ----------------------------------------------------------------- apply

    def embed_nodes(self, params, x):
        """Node embedding h0 = single_embed(x).  x is static across SDE steps
        and poses, so samplers hoist this out of the scan/vmap and pass it
        back via batch['h0'] (the reference recomputes it every forward,
        score_net_mlsb.py:361)."""
        return nn.linear(params["single_embed"], x, self.dtype)

    def apply(
        self,
        params,
        batch,
        key: jax.Array,
        *,
        predict: bool = False,
        return_energy: bool = False,
        train: bool = False,
        scores_only: bool = False,
    ):
        """Forward pass. `predict` skips dedx (inference); `return_energy`
        returns the scalar energy only (contrastive loss); `train` enables
        dropout and second-order-ready dedx; `scores_only` (with predict)
        skips the energy/ires/clash heads — intermediate reverse-SDE steps
        consume only tr_score/rot_score (inference_base.py:416-455), so the
        sampler pays for the R x L energy scan once, at the terminal pose."""
        c = self.cfg
        x = batch["x"]
        pos = batch["pos"]
        node_mask = batch["node_mask"]
        lig_mask = batch["lig_mask"]
        t = jnp.asarray(batch["t"], jnp.float32)

        valid = node_mask.astype(jnp.float32)
        lig_valid = lig_mask * valid
        rec_valid = (1.0 - lig_mask) * valid
        n_lig = jnp.maximum(lig_valid.sum(), 1.0)

        # center on the ligand-CA centroid (score_net_mlsb.py:353-355); the
        # center is detached from the dedx graph (requires_grad set after
        # centering in the reference).  The older score_net.py twin skips
        # this (centering done by its wrapper) — center_in_net=False.
        if self.cfg.center_in_net:
            center = (pos[:, 1, :] * lig_valid[:, None]).sum(0) / n_lig
            pos = pos - jax.lax.stop_gradient(center)

        k_edges, k_drop = jax.random.split(key)

        use_pallas = self.cfg.use_pallas and predict and not train

        scores_only = scores_only and predict and not return_energy

        def core(pos_in):
            return self._core(
                params, batch, x, pos_in, node_mask, lig_mask, t, k_edges, k_drop,
                train, use_pallas, skip_energy=scores_only
            )

        if return_energy:
            return core(pos)[0]

        if predict:
            energy, aux = core(pos)
            dedx = None
            h, coord_out, pos_ca, D, pair_valid = aux
        else:
            # dedx = -dE/d(pos); only ligand CA rows are kept, matching the
            # reference autograd w.r.t. lig_pos (score_net_mlsb.py:428-438).
            #
            # Restructured (round 4, NOTES.md B=8 OOM): instead of
            # jax.grad(core) — whose transposed energy-head scan stacks
            # [n/chunk, chunk, N, C] pair residuals when the training loss
            # differentiates through dedx (second order) — split the chain
            # rule explicitly:
            #   backbone: pos -> h (+ heads aux), one VJP, [N,C]-scale
            #             residuals only;
            #   energy head: dE/dh from a scan whose body computes the
            #             per-chunk grad INSIDE a jax.checkpoint, so the
            #             second-order pass recomputes one [chunk,N,C] pair
            #             block at a time instead of stacking all of them.
            # energy's dependence on pos through pair_mask (dist < cutoff
            # comparisons) has zero gradient a.e., same as the jax.grad path.
            def backbone(pos_in):
                _, aux_in = self._core(
                    params, batch, x, pos_in, node_mask, lig_mask, t,
                    k_edges, k_drop, train, use_pallas, skip_energy=True
                )
                return aux_in

            aux, vjp_bb = jax.vjp(backbone, pos)
            h, coord_out, pos_ca, D, pair_valid = aux
            pair_mask = pair_valid * (D < c.cut_off)
            energy, dE_dh = self._energy_and_grad_h(
                params["to_energy"], h, pair_mask
            )
            cotangents = (
                dE_dh,
                jnp.zeros_like(coord_out),
                jnp.zeros_like(pos_ca),
                jnp.zeros_like(D),
                jnp.zeros_like(pair_valid),
            )
            (dpos,) = vjp_bb(cotangents)
            dedx = -dpos[:, 1, :] * lig_valid[:, None]

        # interface-residue head
        ires = None if scores_only else self._ires(params["to_ires"], h)

        # force from the equivariant coordinate update of ligand CAs
        # (score_net_mlsb.py:396-398)
        r = jax.lax.stop_gradient(pos_ca)
        f = (coord_out - r) * lig_valid[:, None]

        # translation / rotation scores with learned norm rescaling
        # (score_net_mlsb.py:401-411)
        tr_pred = f.sum(0, keepdims=True) / n_lig
        rot_pred = jnp.cross(r, f).sum(0, keepdims=True) / n_lig

        t_emb = self._t_embed(params["t_embed"], t)
        tr_score = self._rescale(
            params["tr_scale"], tr_pred, t_emb, k_drop, train, salt=0
        )
        rot_score = self._rescale(
            params["rot_scale"], rot_pred, t_emb, k_drop, train, salt=1
        )

        if scores_only:
            return {"tr_score": tr_score, "rot_score": rot_score, "f": f}

        outputs = {
            "tr_score": tr_score,
            "rot_score": rot_score,
            "energy": energy,
            "f": f,
            "ires": ires,
        }
        if predict:
            outputs["num_clashes"] = (pair_valid * (D <= 3.0)).sum().astype(jnp.int32)
        else:
            outputs["dedx"] = dedx
        return outputs

    # ------------------------------------------------------------- internals

    def _core(self, params, batch, x, pos, node_mask, lig_mask, t, k_edges, k_drop,
              train, use_pallas=False, skip_energy=False):
        """Everything the energy depends on; differentiable w.r.t. `pos`."""
        c = self.cfg
        valid = node_mask.astype(jnp.float32)
        lig_valid = lig_mask * valid
        rec_valid = (1.0 - lig_mask) * valid

        ca = pos[:, 1, :]
        dist = pairwise_ca_dist(pos)

        # node embedding (precomputed h0 when the sampler hoisted it)
        h0 = batch.get("h0")
        h = h0 if h0 is not None else self.embed_nodes(params, x)

        # stochastic sparse graph + edge features (gathered bins -> lookups)
        idx, edge_mask = select_edges_dispatch(
            c, use_pallas, k_edges, jax.lax.stop_gradient(dist), node_mask
        )
        # EGNN backbone (coord update in the last layer only, ligand-gated)
        if use_pallas:
            # packed [16, E] edge table (6D bins + relpos + coord geometry),
            # built once per step and shared by all 6 layer kernels — in one
            # Pallas pass (ops/edge_table.py) or via the XLA featurize
            if c.edge_table_kernel:
                from dfmdock_tpu.ops.edge_table import build_edge_table

                tab = build_edge_table(
                    idx, edge_mask, jax.lax.stop_gradient(pos),
                    batch["res_id"], batch["asym_id"], normalize=c.normalize,
                )
            else:
                tab = build_edge_table_xla(
                    idx, edge_mask, jax.lax.stop_gradient(pos),
                    batch["res_id"], batch["asym_id"], normalize=c.normalize,
                )
            h, coord_out = egnn_apply_fused(
                params["egnn"],
                params["spatial_embed"]["w"],
                params["positional_embed"]["w"],
                h, ca, tab, edge_mask,
                node_mask, lig_valid,
                dtype=self.dtype,
            )
        else:
            rp = relpos_bin_at(batch["res_id"], batch["asym_id"], idx)
            db, ob, tb, pb = sixd_bins_at(jax.lax.stop_gradient(pos), idx)
            e_spatial = spatial_embed_from_bins(
                params["spatial_embed"]["w"], db, ob, tb, pb
            )
            edge_attr = e_spatial + params["positional_embed"]["w"][rp]
            h, coord_out = egnn_apply(
                params["egnn"],
                h,
                ca,
                idx,
                edge_mask,
                edge_attr,
                node_mask,
                lig_valid,
                normalize=c.normalize,
                dtype=self.dtype,
            )

        # pair mask: receptor x ligand within cutoff (score_net_mlsb.py:389)
        pair_valid = rec_valid[:, None] * lig_valid[None, :]
        pair_mask = pair_valid * (dist < c.cut_off)

        # NOTE: ops/energy_head.py holds a fused Pallas variant of this head;
        # it is numerically validated but perf-neutral vs this XLA scan
        # (53.3 vs 52.8 ms / 16-pose fwd) — parked.
        if skip_energy:
            energy = jnp.float32(0.0)
        else:
            energy = self._energy(params["to_energy"], h, pair_mask, train)
        return energy, (h, coord_out, ca, dist, pair_valid)

    def _energy(self, p, h, pair_mask, train=False):
        """Masked mean of MLP(concat[h_i, h_j]) over rec x lig pairs,
        scanned over row chunks (score_net_mlsb.py:289-294,386-390)."""
        n = h.shape[0]
        c = self.cfg.node_dim
        w = p["l0"]["w"]  # [2C, C] split into the h_i / h_j halves
        hr = nn.linear({"w": w[:c]}, h, self.dtype)
        hl = nn.linear({"w": w[c:]}, h, self.dtype)

        chunk = min(ENERGY_ROW_CHUNK, n)
        assert n % chunk == 0, f"padded N={n} must be a multiple of {chunk}"
        hr_chunks = hr.reshape(n // chunk, chunk, c)
        mask_chunks = pair_mask.reshape(n // chunk, chunk, n)

        def body(carry, inp):
            acc_num, acc_den = carry
            hr_c, m_c = inp
            pair = hr_c[:, None, :] + hl[None, :, :]  # [chunk, N, C]
            e = nn.layer_norm(p["ln"], pair)
            e = jax.nn.silu(e)
            e = nn.linear(p["l1"], e, self.dtype).squeeze(-1)  # [chunk, N]
            return (acc_num + (e * m_c).sum(), acc_den + m_c.sum()), None

        # remat the chunk body IN TRAINING ONLY: scan's backward otherwise
        # stacks every chunk's [chunk, N, C] pair/ln/silu residuals
        # ([n/chunk, chunk, N, C] x several — the dominant HBM term in
        # batched grad-energy training, 784 MB apiece at B=4/N=448).
        # Recomputing a chunk is one small matmul.  Inference keeps the
        # plain body so predict-mode HLO (and the persistent compile cache
        # the bench/CLI executables live in) is unchanged.
        step = jax.checkpoint(body) if train else body
        (num, den), _ = jax.lax.scan(
            step, (jnp.float32(0.0), jnp.float32(0.0)), (hr_chunks, mask_chunks)
        )
        return num / (den + 1e-6)

    def _energy_and_grad_h(self, p, h, pair_mask):
        """Energy (same masked mean as _energy) AND dE/dh, via an explicit
        scan-of-grad: each row chunk's first-order VJP is taken INSIDE the
        rematted scan body, so when the training loss differentiates through
        dedx (second order) the backward recomputes one [chunk, N, C] pair
        block at a time instead of stacking [n/chunk, chunk, N, C] residuals
        across the scan — the B=8 OOM / 37.5 steps/s cap of NOTES.md r3."""
        n = h.shape[0]
        c = self.cfg.node_dim
        w = p["l0"]["w"]  # [2C, C]: h_i / h_j halves
        hr = nn.linear({"w": w[:c]}, h, self.dtype)
        hl = nn.linear({"w": w[c:]}, h, self.dtype)

        chunk = min(ENERGY_ROW_CHUNK, n)
        assert n % chunk == 0, f"padded N={n} must be a multiple of {chunk}"
        hr_chunks = hr.reshape(n // chunk, chunk, c)
        mask_chunks = pair_mask.reshape(n // chunk, chunk, n)

        def chunk_num(hr_c, hl_in, m_c):
            pair = hr_c[:, None, :] + hl_in[None, :, :]  # [chunk, N, C]
            e = nn.layer_norm(p["ln"], pair)
            e = jax.nn.silu(e)
            e = nn.linear(p["l1"], e, self.dtype).squeeze(-1)
            return (e * m_c).sum()

        def body(g_hl_acc, inp):
            hr_c, m_c = inp
            num_c, (g_hr_c, g_hl_c) = jax.value_and_grad(
                chunk_num, argnums=(0, 1)
            )(hr_c, hl, m_c)
            return g_hl_acc + g_hl_c.astype(jnp.float32), (num_c, g_hr_c)

        g_hl, (nums, g_hr_chunks) = jax.lax.scan(
            jax.checkpoint(body),
            jnp.zeros((n, c), jnp.float32),
            (hr_chunks, mask_chunks),
        )
        den = pair_mask.sum() + 1e-6
        energy = nums.sum() / den
        g_hr = g_hr_chunks.reshape(n, c).astype(jnp.float32) / den
        g_hl = g_hl / den
        # back through the two half-linears (hr = h @ w[:C], hl = h @ w[C:])
        dE_dh = g_hr @ w[:c].T + g_hl @ w[c:].T
        return energy, dE_dh

    def _ires(self, p, h):
        y = jax.nn.silu(nn.linear(p["l0"], h))
        y = jax.nn.silu(nn.linear(p["l1"], y))
        return nn.linear(p["l2"], y)

    def _t_embed(self, p, t):
        emb = nn.gaussian_fourier(p, t[None])  # [1, inner]
        return jax.nn.sigmoid(emb @ p["l0"]["w"])  # [1, inner]

    def _rescale(self, p, vec, t_emb, key, train, salt):
        """score = unit(vec) * softplus(MLP([|vec|, t_emb]))
        (score_net_mlsb.py:313-330,407-411)."""
        # sqrt(x+eps) keeps the gradient finite if the predicted vector is ~0
        norm = jnp.sqrt((vec * vec).sum(-1, keepdims=True) + 1e-24)  # [1, 1]
        inp = jnp.concatenate([norm, t_emb], axis=-1)
        y = nn.linear(p["l0"], inp)
        y = nn.layer_norm(p["ln"], y)
        y = nn.dropout(jax.random.fold_in(key, salt), y, self.cfg.dropout, not train)
        y = jax.nn.silu(y)
        y = nn.linear(p["l1"], y)
        scale = jax.nn.softplus(y)
        return vec / (norm + 1e-6) * scale
