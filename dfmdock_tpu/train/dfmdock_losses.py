"""DFMDock-lineage training losses (reference src/models/DFMDock.py:77-244).

Differences from the mlsb loss (train/losses.py): the ligand centroid is the
all-backbone-atom mean (DFMDock.py:246-257), a confidence head is supervised
with the label l_RMSD < 5 A, a fused 64-bin distogram CE runs inside the pair
scan, and the auxiliary terms are weighted 0.1:

  loss = tr + rot + 0.1 * (ec + contrastive + confidence + distogram + ires)

Cropping to crop_size happens in the host data pipeline (see data/crop.py),
equivalent to the reference's in-step crop because it only depends on the
ground-truth geometry.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dfmdock_tpu.config import ExperimentConfig
from dfmdock_tpu.features.sixd import pairwise_ca_dist
from dfmdock_tpu.geom import axis_angle_to_matrix
from dfmdock_tpu.train.losses import _axis_angle_mse, _bce_logits, interface_labels

_EPS_T = 1e-5


def _lig_bb_center(pos, lig_valid):
    n = jnp.maximum(lig_valid.sum(), 1.0)
    return (pos * lig_valid[:, None, None]).sum((0, 1)) / (3.0 * n)


def _modify_coords_bb(pos, lig_valid, rot_aa, tr):
    """Rigid ligand update about the all-backbone-atom mean (DFMDock.py:246-252)."""
    cen = _lig_bb_center(pos, lig_valid)
    rot = axis_angle_to_matrix(rot_aa.reshape(3))
    new_lig = (pos - cen) @ rot.T + cen + tr.reshape(3)
    return jnp.where(lig_valid[:, None, None] > 0, new_lig, pos)


def _center_on_lig(pos, lig_valid):
    return pos - _lig_bb_center(pos, lig_valid)


def dfmdock_loss_fn(
    params, net, r3, so3, batch, key, exp: ExperimentConfig, injected=None
):
    """One training example's DFMDock losses. Returns (total, dict)."""
    from dfmdock_tpu.train.losses import draw_perturbation

    k_draw, k_net, k_net_gt = jax.random.split(key, 3)

    valid = batch["node_mask"].astype(jnp.float32)
    lig_valid = batch["lig_mask"] * valid
    n_lig = jnp.maximum(lig_valid.sum(), 1.0)

    t, tr_scale, tr_update, tr_score_gt, rot_scale, rot_update, rot_score_gt = (
        draw_perturbation(r3, so3, exp, k_draw, injected)
    )

    gt_pos = batch["pos"]
    noised_pos = _modify_coords_bb(gt_pos, lig_valid, rot_update, tr_update)

    # l_RMSD between noised and gt ligand CAs (confidence label, DFMDock.py:116)
    dca = ((noised_pos[:, 1, :] - gt_pos[:, 1, :]) ** 2).sum(-1)
    l_rmsd = jnp.sqrt((dca * lig_valid).sum() / n_lig)

    # center both on the ligand bb mean (DFMDock.py:119-120)
    noised_c = _center_on_lig(noised_pos, lig_valid)
    gt_c = _center_on_lig(gt_pos, lig_valid)

    gt_dist = pairwise_ca_dist(gt_c) if exp.use_dist_loss else None

    noised_batch = dict(batch)
    noised_batch["pos"] = noised_c
    noised_batch["t"] = t

    outputs = net.apply(
        params, noised_batch, k_net,
        predict=not exp.grad_energy, train=True, gt_dist=gt_dist,
    )
    tr_score = outputs["tr_score"]
    rot_score = outputs["rot_score"]
    energy_noised = outputs["energy"]

    # energy conservation (DFMDock.py:127-150)
    if exp.grad_energy:
        f, dedx = outputs["f"], outputs["dedx"]
        if exp.separate_energy_loss:
            ec_loss = _axis_angle_mse(f, dedx, jnp.float32(1.0), n=n_lig)
        else:
            ec_loss = ((dedx - f) ** 2 * lig_valid[:, None]).sum() / (3 * n_lig)
    else:
        ec_loss = jnp.float32(0.0)

    # score matching (DFMDock.py:162-197)
    if exp.perturb_tr:
        tr_loss = (
            _axis_angle_mse(tr_score, tr_score_gt, tr_scale)
            if exp.separate_tr_loss
            else ((tr_score - tr_score_gt) ** 2 / tr_scale**2).mean()
        )
    else:
        tr_loss = jnp.float32(0.0)
    if exp.perturb_rot:
        rot_loss = (
            _axis_angle_mse(rot_score, rot_score_gt, rot_scale)
            if exp.separate_rot_loss
            else ((rot_score - rot_score_gt) ** 2 / rot_scale**2).mean()
        )
    else:
        rot_loss = jnp.float32(0.0)

    # contrastive energy (DFMDock.py:199-207)
    if exp.use_contrastive_loss:
        gt_batch = dict(batch)
        gt_batch["pos"] = gt_c
        gt_batch["t"] = t
        energy_gt = net.apply(params, gt_batch, k_net_gt, return_energy=True, train=True)
        el_loss = jax.nn.softplus(energy_gt - energy_noised)
    else:
        el_loss = jnp.float32(0.0)

    # distogram CE (fused in the net's pair scan)
    dist_loss = outputs.get("dist_loss", jnp.float32(0.0)) if exp.use_dist_loss else jnp.float32(0.0)

    # interface BCE at 8 A (DFMDock.py:218-222, labels from the gt pose)
    if exp.use_interface_loss:
        labels = interface_labels(gt_pos, batch["lig_mask"], batch["node_mask"])
        ires_loss = _bce_logits(outputs["ires_logits"], labels, valid)
    else:
        ires_loss = jnp.float32(0.0)

    # confidence BCE with label l_RMSD < 5 A (DFMDock.py:224-229)
    if exp.use_confidence_loss:
        label = (l_rmsd < 5.0).astype(jnp.float32)
        logit = outputs["confidence_logits"]
        conf_loss = (
            jnp.maximum(logit, 0) - logit * label + jnp.log1p(jnp.exp(-jnp.abs(logit)))
        )
    else:
        conf_loss = jnp.float32(0.0)

    loss = tr_loss + rot_loss + 0.1 * (ec_loss + el_loss + conf_loss + dist_loss + ires_loss)
    return loss, {
        "tr_loss": tr_loss,
        "rot_loss": rot_loss,
        "ec_loss": ec_loss,
        "el_loss": el_loss,
        "dist_loss": dist_loss,
        "ires_loss": ires_loss,
        "conf_loss": conf_loss,
        "l_rmsd": l_rmsd,
        "loss": loss,
    }
