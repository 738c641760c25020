"""EGNNNet — the DFMDock-lineage score network (training-oriented).

Re-design of reference src/models/egnn_net.py:289-531 for TPU.  Differences
from the mlsb ScoreNet:
- the EGNN never moves coordinates (update_coords=False everywhere,
  egnn_net.py:267-277);
- forces come from a per-pair scalar head: f_ij = unit(rec_i -> lig_j) *
  MLP([h_i, h_j, D_ij]), aggregated over receptor rows (egnn_net.py:338-343,
  465-469);
- extra pair heads over the same interaction tensor: energy (+D feature),
  64-bin distogram, scalar confidence; plus the node-level interface head.

All four pair heads share one interaction row-chunk scan so the [R, L, 2C+1]
tensor never materializes; the distogram *loss* is also computed inside the
scan (logits for a full complex would be [R, L, 64]).

Batch contract: identical to ScoreNet (see score_net.py).  NOTE: this net
does NOT center coordinates; the wrapper/loss centers on the ligand before
calling (DFMDock.py:254-257).
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
from dfmdock_tpu.models.egnn import egcl_init, egcl_apply

ROW_CHUNK = 64
NUM_DIST_BINS = 64  # distogram head (egnn_net.py:346-351)


def _pair_head_init(key, node_dim, out_dim):
    k0, k1 = jax.random.split(key)
    return {
        "l0": nn.linear_init(k0, 2 * node_dim + 1, node_dim, bias=False),
        "ln": nn.layer_norm_init(node_dim),
        "l1": nn.linear_init(k1, node_dim, out_dim, bias=False),
    }


def _pair_head(p, pre, d):
    """MLP over interaction [.., 2C+1] given pre-split hidden parts.

    pre = h_i @ W[:C] + h_j @ W[C:2C] (computed by the caller); d is the
    distance feature completing the concat (row 2C of W)."""
    y = pre + d[..., None] * p["l0"]["w"][-1]
    y = nn.layer_norm(p["ln"], y)
    y = jax.nn.silu(y)
    return y @ p["l1"]["w"]


class EGNNNet:
    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.dtype = None if cfg.compute_dtype == "float32" else jnp.dtype(cfg.compute_dtype)

    def init(self, key: jax.Array):
        c = self.cfg
        ks = jax.random.split(key, 14)
        egnn = [
            egcl_init(ks_i, c.node_dim, c.edge_dim, update_coords=False)
            for ks_i in jax.random.split(ks[3], c.depth)
        ]
        return {
            "single_embed": nn.linear_init(ks[0], c.lm_embed_dim, c.node_dim, bias=False),
            "spatial_embed": nn.linear_init(ks[1], SPATIAL_DIM, c.edge_dim, bias=False),
            "positional_embed": nn.linear_init(
                ks[2], NUM_RELPOS_CLASSES, c.edge_dim, bias=False
            ),
            "egnn": egnn,
            "to_energy": _pair_head_init(ks[4], c.node_dim, 1),
            "to_force": _pair_head_init(ks[5], c.node_dim, 1),
            "to_dist": _pair_head_init(ks[6], c.node_dim, NUM_DIST_BINS),
            "to_confidence": _pair_head_init(ks[7], c.node_dim, 1),
            "to_ires": {
                "l0": nn.linear_init(ks[8], c.node_dim, 2 * c.node_dim),
                "l1": nn.linear_init(ks[9], 2 * c.node_dim, 2 * c.node_dim),
                "l2": nn.linear_init(ks[10], 2 * c.node_dim, 1),
            },
            "t_embed": {
                **nn.gaussian_fourier_init(ks[11], c.inner_dim),
                "l0": nn.linear_init(ks[11], c.inner_dim, c.inner_dim, bias=False),
            },
            "tr_scale": self._scale_mlp_init(ks[12]),
            "rot_scale": self._scale_mlp_init(ks[13]),
        }

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
        """Node embedding h0 = single_embed(x); static across SDE steps and
        poses, so samplers hoist it out of the scan/vmap (batch['h0'])."""
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
        gt_dist: jnp.ndarray | None = None,
    ):
        """Forward pass.  If `gt_dist` ([N, N] ground-truth CA distances) is
        given, the masked distogram cross-entropy is computed inside the pair
        scan and returned as outputs['dist_loss'] (egnn_net.py:459 +
        loss.py:65-92 fused)."""
        c = self.cfg
        x = batch["x"]
        pos = batch["pos"]
        node_mask = batch["node_mask"]
        lig_mask = batch["lig_mask"]
        t = jnp.asarray(batch["t"], jnp.float32)

        valid = node_mask.astype(jnp.float32)
        lig_valid = lig_mask * valid

        k_edges, k_drop = jax.random.split(key)

        # intermediate reverse-SDE steps consume only tr/rot scores, which
        # come from the pair force head — skip the energy/confidence/ires/
        # clash heads there (the sampler evaluates them once, at the end)
        scores_only = scores_only and predict and not return_energy

        # fused Pallas EGCL stack (inference only — the kernel has no VJP);
        # the DFMDock stack never updates coords, so every layer maps onto
        # the agg-only kernel (VERDICT r2 Missing #4: the DFMDock lineage had
        # no fast path; match egnn_net.py:408-531)
        use_pallas = c.use_pallas and predict and not train

        def core(pos_in):
            return self._core(params, batch, x, pos_in, node_mask, lig_mask, t,
                              k_edges, gt_dist, skip_heads=scores_only,
                              use_pallas=use_pallas)

        if return_energy:
            return core(pos)[0]

        if predict:
            energy, aux = core(pos)
            dedx = None
            h, f, conf_logits, dist_loss, D, pair_valid = aux
        else:
            # dedx = -dE/d(pos), restructured like score_net.apply (r4):
            # backbone VJP (EGNN stack + pairwise dist; the heads scan gets
            # ZERO cotangents, its transpose residuals bounded by the remat
            # body) + an explicit scan-of-grad for dE/dh and dE/ddist whose
            # body takes the per-chunk first-order VJP inside jax.checkpoint
            # — the second-order training backward then recomputes one
            # [chunk, N, C] block at a time instead of stacking them all
            # (NOTES.md r3: B=8 OOM, inner transposed-dedx scan residuals).
            def backbone(pos_in):
                _, aux_in = self._core(
                    params, batch, x, pos_in, node_mask, lig_mask, t,
                    k_edges, gt_dist, skip_heads=False, use_pallas=False,
                    skip_energy=True, remat=True,
                )
                return aux_in

            aux, vjp_bb = jax.vjp(backbone, pos)
            h, f, conf_logits, dist_loss, D, pair_valid = aux
            energy_mask = pair_valid * (D < c.cut_off)
            energy, dE_dh, dE_ddist = self._energy_and_grads(
                params["to_energy"], h, D, energy_mask
            )
            cotangents = (
                dE_dh,
                jnp.zeros_like(f),
                jnp.zeros_like(conf_logits),
                jnp.zeros_like(dist_loss),
                dE_ddist,
                jnp.zeros_like(pair_valid),
            )
            (dpos,) = vjp_bb(cotangents)
            dedx = -dpos[:, 1, :] * lig_valid[:, None]

        ires = None if scores_only else self._ires(params["to_ires"], h)

        n_lig = jnp.maximum(lig_valid.sum(), 1.0)
        if c.agg == "mean":
            tr_pred = f.sum(0, keepdims=True) / n_lig
        else:
            tr_pred = f.sum(0, keepdims=True)
        r = jax.lax.stop_gradient(pos[:, 1, :]) * lig_valid[:, None]
        cross = jnp.cross(r, f)
        if c.agg == "mean":
            rot_pred = cross.sum(0, keepdims=True) / n_lig
        else:
            rot_pred = cross.sum(0, keepdims=True)

        t_emb = self._t_embed(params["t_embed"], t)
        tr_score = self._rescale(params["tr_scale"], tr_pred, t_emb, k_drop, train, 0)
        rot_score = self._rescale(params["rot_scale"], rot_pred, t_emb, k_drop, train, 1)

        if scores_only:
            return {"tr_score": tr_score, "rot_score": rot_score, "f": f}

        outputs = {
            "tr_score": tr_score,
            "rot_score": rot_score,
            "energy": energy,
            "f": f,
            "ires_logits": ires,
            "confidence_logits": conf_logits,
        }
        if gt_dist is not None:
            outputs["dist_loss"] = dist_loss
        if predict:
            outputs["num_clashes"] = (pair_valid * (D <= 3.0)).sum().astype(jnp.int32)
        else:
            outputs["dedx"] = dedx
        return outputs

    # ------------------------------------------------------------- internals

    def _core(self, params, batch, x, pos, node_mask, lig_mask, t, k_edges,
              gt_dist, skip_heads=False, use_pallas=False, skip_energy=False,
              remat=False):
        c = self.cfg
        valid = node_mask.astype(jnp.float32)
        lig_valid = lig_mask * valid
        rec_valid = (1.0 - lig_mask) * valid

        ca = pos[:, 1, :]
        # The pair heads' distance feature D and the cutoff masks are DETACHED
        # from the coordinate graph in the reference (vec/D are computed
        # BEFORE lig_pos.requires_grad_(), egnn_net.py:417-424), so dedx flows
        # only through the EGNN's live coordinate usage. `ca` stays live.
        dist = jax.lax.stop_gradient(pairwise_ca_dist(pos))

        h0 = batch.get("h0")
        h = h0 if h0 is not None else self.embed_nodes(params, x)

        idx, edge_mask = select_edges_dispatch(
            c, use_pallas, k_edges, jax.lax.stop_gradient(dist), node_mask
        )
        if use_pallas:
            from dfmdock_tpu.models.egnn import (
                build_edge_table_xla,
                egnn_apply_fused,
            )

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
            h, _ = egnn_apply_fused(
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
            edge_attr = spatial_embed_from_bins(
                params["spatial_embed"]["w"], db, ob, tb, pb
            )
            edge_attr = edge_attr + params["positional_embed"]["w"][rp]

            for p in params["egnn"]:
                h, _ = egcl_apply(
                    p, h, ca, idx, edge_mask, edge_attr, node_mask, lig_valid,
                    normalize=c.normalize, update_coords=False, dtype=self.dtype,
                )

        pair_valid = rec_valid[:, None] * lig_valid[None, :]
        energy_mask = pair_valid * (dist < c.cut_off)

        # directional unit vectors rec_i -> lig_j ... sign convention:
        # vec = rec - lig (egnn_net.py:418)
        # computed per chunk inside the scan to avoid [N,N,3] residency

        # pre-split the first Linear of each pair head: h_i @ W_top + h_j @ W_bot
        def split(p):
            w = p["l0"]["w"]
            return h @ w[: c.node_dim], h @ w[c.node_dim : 2 * c.node_dim]

        fh_i, fh_j = split(params["to_force"])
        if not skip_heads:
            eh_i, eh_j = split(params["to_energy"])
            ch_i, ch_j = split(params["to_confidence"])
        if gt_dist is not None:
            dh_i, dh_j = split(params["to_dist"])

        n = h.shape[0]
        chunk = min(ROW_CHUNK, n)
        assert n % chunk == 0

        ca_r = ca.reshape(n // chunk, chunk, 3)
        dist_r = dist.reshape(n // chunk, chunk, n)
        emask_r = energy_mask.reshape(n // chunk, chunk, n)
        pvalid_r = pair_valid.reshape(n // chunk, chunk, n)

        def body(carry, inp):
            (e_num, e_den, c_num, c_den, f_acc, d_num, d_den, i0) = carry
            ca_c, d_c, em_c, pv_c = inp

            if not skip_heads:
                if not skip_energy:
                    e = _pair_head(
                        params["to_energy"],
                        _rows(eh_i, i0, chunk)[:, None] + eh_j[None, :], d_c
                    ).squeeze(-1)
                    e_num = e_num + (e * em_c).sum()
                    e_den = e_den + em_c.sum()

                cl = _pair_head(
                    params["to_confidence"],
                    _rows(ch_i, i0, chunk)[:, None] + ch_j[None, :], d_c
                ).squeeze(-1)
                c_num = c_num + (cl * pv_c).sum()
                c_den = c_den + pv_c.sum()

            fs = _pair_head(
                params["to_force"],
                _rows(fh_i, i0, chunk)[:, None] + fh_j[None, :], d_c
            )  # [chunk, N, 1]
            vec = ca_c[:, None, :] - ca[None, :, :]  # rec_i - lig_j
            unit = vec / jnp.sqrt(jnp.maximum((vec**2).sum(-1, keepdims=True), 1e-12))
            # aggregate over receptor rows i: sum_i unit_ij * fs_ij, masked
            f_acc = f_acc + (unit * fs * pv_c[..., None]).sum(0)  # [N, 3]

            if gt_dist is not None:
                logits = _pair_head(
                    params["to_dist"],
                    _rows(dh_i, i0, chunk)[:, None] + dh_j[None, :], d_c
                )  # [chunk, N, 64]
                gt_c = jax.lax.dynamic_slice_in_dim(gt_dist, i0 * chunk, chunk, 0)
                bounds = jnp.linspace(3.25, 50.75, NUM_DIST_BINS - 1) ** 2
                true_bins = (gt_c[..., None] ** 2 > bounds).sum(-1)
                logp = jax.nn.log_softmax(logits, -1)
                ce = -jnp.take_along_axis(logp, true_bins[..., None], -1).squeeze(-1)
                d_num = d_num + (ce * pv_c).sum()
                d_den = d_den + pv_c.sum()

            return (e_num, e_den, c_num, c_den, f_acc, d_num, d_den, i0 + 1), None

        zero = jnp.float32(0.0)
        init = (zero, zero, zero, zero, jnp.zeros((n, 3)), zero, zero, jnp.int32(0))
        # remat IN THE DEDX/TRAINING PATH ONLY (predict-mode HLO and its
        # compile-cache entries unchanged): without it the scan backward
        # stacks every chunk's [chunk, N, C] head residuals
        step = jax.checkpoint(body) if remat else body
        (e_num, e_den, c_num, c_den, f_acc, d_num, d_den, _), _ = jax.lax.scan(
            step, init, (ca_r, dist_r, emask_r, pvalid_r)
        )

        if c.agg == "mean":
            energy = e_num / jnp.maximum(e_den, 1.0)
            n_rec = jnp.maximum(rec_valid.sum(), 1.0)
            f = f_acc / n_rec * lig_valid[:, None]
        else:
            energy = e_num
            f = f_acc * lig_valid[:, None]

        conf_logits = c_num / jnp.maximum(c_den, 1.0)
        dist_loss = d_num / jnp.maximum(d_den, 1.0)

        return energy, (h, f, conf_logits, dist_loss, dist, pair_valid)

    def _energy_and_grads(self, p, h, dist, energy_mask):
        """Energy (same masked aggregate as _core's scan) AND its gradients
        w.r.t. h and dist, via a scan-of-grad with a rematted body: the
        per-chunk VJP happens inside jax.checkpoint, so second-order
        differentiation (training loss through dedx) recomputes one
        [chunk, N, C] pair block at a time (mirror of
        score_net._energy_and_grad_h; reference autograd DFMDock.py /
        egnn_net.py:417-438)."""
        c = self.cfg
        n = h.shape[0]
        w = p["l0"]["w"]  # [2C+1, C]: h_i / h_j halves + distance row
        eh_i = h @ w[: c.node_dim]
        eh_j = h @ w[c.node_dim : 2 * c.node_dim]

        chunk = min(ROW_CHUNK, n)
        assert n % chunk == 0
        ehi_r = eh_i.reshape(n // chunk, chunk, c.node_dim)
        dist_r = dist.reshape(n // chunk, chunk, n)
        emask_r = energy_mask.reshape(n // chunk, chunk, n)

        def chunk_num(ehi_c, ehj, d_c, em_c):
            e = _pair_head(p, ehi_c[:, None] + ehj[None, :], d_c).squeeze(-1)
            return (e * em_c).sum()

        def body(g_ehj_acc, inp):
            ehi_c, d_c, em_c = inp
            num_c, (g_ehi_c, g_ehj_c, g_d_c) = jax.value_and_grad(
                chunk_num, argnums=(0, 1, 2)
            )(ehi_c, eh_j, d_c, em_c)
            return (g_ehj_acc + g_ehj_c.astype(jnp.float32),
                    (num_c, g_ehi_c, g_d_c))

        g_ehj, (nums, g_ehi_chunks, g_d_chunks) = jax.lax.scan(
            jax.checkpoint(body),
            jnp.zeros((n, c.node_dim), jnp.float32),
            (ehi_r, dist_r, emask_r),
        )
        e_num = nums.sum()
        if c.agg == "mean":
            den = jnp.maximum(energy_mask.sum(), 1.0)
        else:
            den = jnp.float32(1.0)
        energy = e_num / den
        g_ehi = g_ehi_chunks.reshape(n, c.node_dim).astype(jnp.float32) / den
        g_ehj = g_ehj / den
        dE_dh = g_ehi @ w[: c.node_dim].T + g_ehj @ w[c.node_dim : 2 * c.node_dim].T
        dE_ddist = g_d_chunks.reshape(n, n).astype(jnp.float32) / den
        return energy, dE_dh, dE_ddist

    def _ires(self, p, h):
        y = jax.nn.silu(nn.linear(p["l0"], h))
        y = jax.nn.silu(nn.linear(p["l1"], y))
        return nn.linear(p["l2"], y)

    def _t_embed(self, p, t):
        emb = nn.gaussian_fourier(p, t[None])
        return jax.nn.sigmoid(emb @ p["l0"]["w"])

    def _rescale(self, p, vec, t_emb, key, train, salt):
        norm = jnp.sqrt((vec * vec).sum(-1, keepdims=True) + 1e-24)
        inp = jnp.concatenate([norm, t_emb], axis=-1)
        y = nn.linear(p["l0"], inp)
        y = nn.layer_norm(p["ln"], y)
        y = nn.dropout(jax.random.fold_in(key, salt), y, self.cfg.dropout, not train)
        y = jax.nn.silu(y)
        y = nn.linear(p["l1"], y)
        return vec / (norm + 1e-6) * jax.nn.softplus(y)


def _rows(arr, i0, chunk):
    return jax.lax.dynamic_slice_in_dim(arr, i0 * chunk, chunk, 0)
