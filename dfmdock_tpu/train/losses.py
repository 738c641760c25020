"""Training losses for the mlsb lineage (score-matching + force-matching).

Mirrors reference src/models/score_model_mlsb.py:65-191 as one pure function:
sample t ~ U(eps, 1), draw forward rot/tr perturbations, perturb the ligand,
run the net, and combine
  tr + rot + ec + contrastive + interface
losses (each optionally in the separate axis/angle form).  All reductions are
masked so padded rows contribute nothing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dfmdock_tpu.config import ExperimentConfig
from dfmdock_tpu.sampler.em import modify_coords

_EPS_T = 1e-5


def interface_labels(pos, lig_mask, node_mask, threshold: float = 8.0):
    """[N,1] binary interface labels: CA within 8 A of the other chain
    (reference ppi_dataset.py:105-123)."""
    valid = node_mask.astype(jnp.float32)
    lig = lig_mask * valid
    rec = (1.0 - lig_mask) * valid
    ca = pos[:, 1, :]
    d = jnp.sqrt(jnp.maximum(((ca[:, None] - ca[None, :]) ** 2).sum(-1), 1e-12))
    cross = rec[:, None] * lig[None, :]
    close = (d < threshold) & (cross > 0)
    is_iface = close.any(1) | close.any(0)
    return (is_iface.astype(jnp.float32) * valid)[:, None]


def _safe_norm(x, axis=-1, keepdims=True):
    """norm with a zero (not NaN) gradient at x == 0 — rec/padding rows of f
    and dedx are exactly zero and the ec loss differentiates through them."""
    sq = (x * x).sum(axis=axis, keepdims=keepdims)
    return jnp.sqrt(sq + 1e-24)


def _axis_angle_mse(pred, gt, scale, n=None):
    """0.5 * (axis MSE + angle MSE / scale^2) decomposition
    (score_model_mlsb.py:134-168)."""
    gt_angle = _safe_norm(gt)
    gt_axis = gt / (gt_angle + 1e-6)
    pred_angle = _safe_norm(pred)
    pred_axis = pred / (pred_angle + 1e-6)
    if n is None:
        axis_loss = ((pred_axis - gt_axis) ** 2).mean()
        angle_loss = ((pred_angle - gt_angle) ** 2 / scale**2).mean()
    else:
        axis_loss = ((pred_axis - gt_axis) ** 2).sum() / (3 * n)
        angle_loss = ((pred_angle - gt_angle) ** 2 / scale**2).sum() / n
    return 0.5 * (axis_loss + angle_loss)


def _bce_logits(logits, labels, mask):
    """Masked mean binary cross-entropy with logits."""
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    m = mask[:, None]
    return (per * m).sum() / jnp.maximum(m.sum(), 1.0)


def draw_perturbation(r3, so3, exp: ExperimentConfig, key, injected=None):
    """Sample (t, tr/rot perturbations + gt scores + scalings) for one loss
    step (score_model_mlsb.py:66-94).  `injected` optionally supplies all
    values (keys t, tr_update, tr_score_gt, tr_scale, rot_update,
    rot_score_gt, rot_scale) for deterministic eval / reference parity."""
    k_t, k_tr, k_rot = jax.random.split(key, 3)
    if injected is not None:
        f32 = lambda k: jnp.asarray(injected[k], jnp.float32)
        return (
            f32("t"),
            f32("tr_scale"), f32("tr_update").reshape(1, 3),
            f32("tr_score_gt").reshape(1, 3),
            f32("rot_scale"), f32("rot_update").reshape(1, 3),
            f32("rot_score_gt").reshape(1, 3),
        )
    t = jax.random.uniform(k_t) * (1.0 - _EPS_T) + _EPS_T
    if exp.perturb_tr:
        tr_scale = r3.score_scaling(t)
        tr_update, tr_score_gt = r3.forward_marginal(k_tr, t)
    else:
        tr_scale = jnp.float32(1.0)
        tr_update = jnp.zeros((1, 3))
        tr_score_gt = jnp.zeros((1, 3))
    if exp.perturb_rot:
        rot_scale = so3.score_scaling(t)
        rot_update, rot_score_gt = so3.forward_marginal(k_rot, t)
    else:
        rot_scale = jnp.float32(1.0)
        rot_update = jnp.zeros((1, 3))
        rot_score_gt = jnp.zeros((1, 3))
    return t, tr_scale, tr_update, tr_score_gt, rot_scale, rot_update, rot_score_gt


def loss_fn(params, net, r3, so3, batch, key, exp: ExperimentConfig, injected=None):
    """One training example's losses. Returns (total_loss, dict of terms)."""
    k_draw, k_net, k_net_gt = jax.random.split(key, 3)

    valid = batch["node_mask"].astype(jnp.float32)
    lig_valid = batch["lig_mask"] * valid
    n_lig = jnp.maximum(lig_valid.sum(), 1.0)

    # forward perturbation (score_model_mlsb.py:72-94)
    t, tr_scale, tr_update, tr_score_gt, rot_scale, rot_update, rot_score_gt = (
        draw_perturbation(r3, so3, exp, k_draw, injected)
    )

    gt_pos = batch["pos"]
    noised_pos = modify_coords(gt_pos, batch["lig_mask"], rot_update, tr_update)

    noised = dict(batch)
    noised["pos"] = noised_pos
    noised["t"] = t

    outputs = net.apply(params, noised, k_net, predict=not exp.grad_energy, train=True)
    tr_score = outputs["tr_score"]
    rot_score = outputs["rot_score"]
    energy_noised = outputs["energy"]

    # energy-conservation loss: force head vs -dE/dx (score_model_mlsb.py:109-121)
    if exp.grad_energy:
        f = outputs["f"]
        dedx = outputs["dedx"]
        if exp.separate_energy_loss:
            ec_loss = _axis_angle_mse(f, dedx, jnp.float32(1.0), n=n_lig)
        else:
            ec_loss = ((dedx - f) ** 2 * lig_valid[:, None]).sum() / (3 * n_lig)
    else:
        ec_loss = jnp.float32(0.0)

    # score-matching losses (score_model_mlsb.py:134-168)
    if exp.perturb_tr:
        if exp.separate_tr_loss:
            tr_loss = _axis_angle_mse(tr_score, tr_score_gt, tr_scale)
        else:
            tr_loss = ((tr_score - tr_score_gt) ** 2 / tr_scale**2).mean()
    else:
        tr_loss = jnp.float32(0.0)
    if exp.perturb_rot:
        if exp.separate_rot_loss:
            rot_loss = _axis_angle_mse(rot_score, rot_score_gt, rot_scale)
        else:
            rot_loss = ((rot_score - rot_score_gt) ** 2 / rot_scale**2).mean()
    else:
        rot_loss = jnp.float32(0.0)

    # interface BCE on valid nodes (score_model_mlsb.py:171-175)
    if exp.use_interface_loss:
        labels = batch.get("ires")
        if labels is None:
            labels = interface_labels(gt_pos, batch["lig_mask"], batch["node_mask"])
        ires_loss = _bce_logits(outputs["ires"], labels, valid)
    else:
        ires_loss = jnp.float32(0.0)

    # contrastive energy: gt complex should have lower energy than noised
    # pose(s); CE over [-E_gt, -E_1..-E_K] with target 0 — for K=1 this is
    # softplus(E_gt - E_noised) (score_model_mlsb.py:177-185).  Round-4
    # knobs (VERDICT r3 #3): weight/margin, a separate small-t_c negative
    # construction (hard near-native negatives), and K>1 negatives
    # (InfoNCE); defaults reproduce the reference construction exactly.
    if exp.use_contrastive_loss:
        margin = jnp.float32(exp.contrastive_margin)
        own_pair = (exp.contrastive_t_max > 0.0
                    or exp.contrastive_negatives > 1
                    or exp.contrastive_clash_negatives > 0)
        if not own_pair:
            gt_batch = dict(batch)
            gt_batch["t"] = t
            energy_gt = net.apply(params, gt_batch, k_net_gt,
                                  return_energy=True, train=True)
            el_loss = jax.nn.softplus(energy_gt - energy_noised + margin)
        else:
            k_tc = jax.random.fold_in(k_net_gt, 777)
            if exp.contrastive_t_max > 0.0:
                t_c = (_EPS_T + jax.random.uniform(k_tc)
                       * (exp.contrastive_t_max - _EPS_T))
            else:
                t_c = t
            gt_batch = dict(batch)
            gt_batch["t"] = t_c
            energy_gt = net.apply(
                params, gt_batch, jax.random.fold_in(k_net_gt, 0),
                return_energy=True, train=True)
            gaps = []
            for i in range(exp.contrastive_negatives):
                k_i = jax.random.fold_in(k_net_gt, 1 + i)
                k_tr_i, k_rot_i, k_e_i = jax.random.split(k_i, 3)
                tr_i, _ = r3.forward_marginal(k_tr_i, t_c)
                rot_i, _ = so3.forward_marginal(k_rot_i, t_c)
                neg = dict(batch)
                neg["pos"] = modify_coords(gt_pos, batch["lig_mask"],
                                           rot_i, tr_i)
                neg["t"] = t_c
                e_i = net.apply(params, neg, k_e_i, return_energy=True,
                                train=True)
                gaps.append(energy_gt - e_i + margin)
            # over-buried negatives (contrastive_clash_negatives): translate
            # the native ligand toward the receptor centroid by U(1, 5) A —
            # the decoy family the held-out energy mis-ranks below the native
            # (NOTES.md round 4 gt-margin probe); no rotation, so the only
            # change vs the native is deeper burial.
            if exp.contrastive_clash_negatives > 0:
                ca = gt_pos[:, 1, :]
                rec_valid = (1.0 - batch["lig_mask"]) * valid
                rec_c = (rec_valid[:, None] * ca).sum(0) / jnp.maximum(
                    rec_valid.sum(), 1.0)
                lig_c = (lig_valid[:, None] * ca).sum(0) / jnp.maximum(
                    lig_valid.sum(), 1.0)
                dirn = rec_c - lig_c
                dirn = dirn / jnp.maximum(jnp.sqrt((dirn ** 2).sum()), 1e-6)
                for i in range(exp.contrastive_clash_negatives):
                    k_i = jax.random.fold_in(k_net_gt, 101 + i)
                    k_d, k_e_i = jax.random.split(k_i)
                    delta = jax.random.uniform(k_d, minval=1.0, maxval=5.0)
                    neg = dict(batch)
                    neg["pos"] = modify_coords(
                        gt_pos, batch["lig_mask"], jnp.zeros(3), dirn * delta)
                    neg["t"] = t_c
                    e_i = net.apply(params, neg, k_e_i, return_energy=True,
                                    train=True)
                    gaps.append(energy_gt - e_i + margin)
            # log(1 + sum_i exp(gap_i)): K=1 -> softplus(gap); stabilized
            # with the max trick (gaps can be large early in training)
            g = jnp.stack(gaps)
            m = jnp.maximum(g.max(), 0.0)
            el_loss = m + jnp.log(jnp.exp(-m) + jnp.exp(g - m).sum())
        el_loss = el_loss * jnp.float32(exp.contrastive_weight)
    else:
        el_loss = jnp.float32(0.0)

    loss = tr_loss + rot_loss + ec_loss + el_loss + ires_loss
    return loss, {
        "tr_loss": tr_loss,
        "rot_loss": rot_loss,
        "ec_loss": ec_loss,
        "el_loss": el_loss,
        "ires_loss": ires_loss,
        "loss": loss,
    }
