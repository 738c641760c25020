"""Euler–Maruyama reverse-SDE pose sampler — one jitted scan, vmapped poses.

Re-designs the reference's sequential Python loops (inference_base.py:390-468:
40 SDE steps per pose, 120 poses per complex, both `for` loops) as:

  sample_many = vmap(scan(step))          # poses x steps on one chip
  step = featurize -> ScoreNet -> SO3/R3 reverse update (+ clash force)

All randomness flows through explicit PRNG keys, so pose sets are
reproducible under seed and independent across poses.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dfmdock_tpu.config import SamplerConfig
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.geom import (
    axis_angle_to_matrix,
    compose_axis_angle,
    matrix_to_axis_angle,
    random_rotation_matrix,
)


def _lig_center(lig_pos, lig_mask, mode: str):
    """Ligand centroid: 'ca' = CA mean (inference_base.py:322,343), 'bb' =
    all-backbone-atom mean (inference.py:224-225,245)."""
    m = lig_mask[:, None]
    n = jnp.maximum(lig_mask.sum(), 1.0)
    if mode == "bb":
        return (lig_pos * m[..., None]).sum((0, 1)) / (3.0 * n)
    return (lig_pos[:, 1, :] * m).sum(0) / n


def randomize_pose(key, pos, lig_mask, node_mask, cfg: SamplerConfig):
    """Random initial pose: uniform SO(3) rotation of the ligand about its
    centroid + N(0, 30 A) translation landing it near the receptor centroid
    (inference_base.py:318-340).

    Returns (pos', tr_update [1,3], rot_update [1,3])."""
    valid = node_mask.astype(jnp.float32)
    lig = lig_mask * valid
    rec = (1.0 - lig_mask) * valid

    lig_pos = pos * lig[:, None, None]
    c2 = _lig_center(pos, lig, cfg.center_mode)
    n_rec = jnp.maximum(rec.sum(), 1.0)
    if cfg.center_mode == "bb":
        c1 = (pos * rec[:, None, None]).sum((0, 1)) / (3.0 * n_rec)
    else:
        c1 = (pos[:, 1, :] * rec[:, None]).sum(0) / n_rec

    k_rot, k_tr = jax.random.split(key)
    rot_mat = random_rotation_matrix(k_rot)
    tr_update = (
        jax.random.normal(k_tr, (1, 3)) * cfg.init_tr_sigma - c2[None] + c1[None]
    )

    new_lig = (pos - c2) @ rot_mat.T + c2 + tr_update[0]
    pos = jnp.where(lig[:, None, None] > 0, new_lig, pos)
    rot_update = matrix_to_axis_angle(rot_mat[None])
    return pos, tr_update, rot_update


def modify_coords(pos, lig_mask, rot_aa, tr, mode: str = "ca"):
    """Rigid update of ligand rows about the ligand centroid
    (inference_base.py:342-352)."""
    center = _lig_center(pos, lig_mask, mode)
    rot = axis_angle_to_matrix(rot_aa.reshape(3))
    new_lig = (pos - center) @ rot.T + center + tr.reshape(3)
    return jnp.where(lig_mask[:, None, None] > 0, new_lig, pos)


def clash_force(pos, lig_mask, node_mask):
    """Repulsion-gradient translation nudging clashing ligands apart
    (inference_base.py:366-384): rep(d) = |4-d|^1.5 / (1.5 * d * 0.5) for
    d < 4 A over all rec x lig backbone-atom pairs; force = d(-5*sum)/d(lig),
    averaged over ligand atoms."""
    valid = node_mask.astype(jnp.float32)
    lig = lig_mask * valid
    rec = (1.0 - lig_mask) * valid
    rec_atoms = pos.reshape(-1, 3)
    rec_w = jnp.repeat(rec, 3)
    lig_w = jnp.repeat(lig, 3)

    def neg_rep(lig_atoms):
        d = jnp.sqrt(
            jnp.maximum(
                ((rec_atoms[:, None] - lig_atoms[None, :]) ** 2).sum(-1), 1e-12
            )
        )
        x0, p, w_rep = 4.0, 1.5, 5.0
        rep = jnp.where(d < x0, jnp.abs(x0 - d) ** p / (p * d * (p - 1)), 0.0)
        rep = rep * rec_w[:, None] * lig_w[None, :]
        return -w_rep * rep.sum()

    grad = jax.grad(neg_rep)(pos.reshape(-1, 3))
    n_lig_atoms = jnp.maximum(lig_w.sum(), 1.0)
    return (grad * lig_w[:, None]).sum(0) / n_lig_atoms


class EMSampler:
    """Reverse-SDE docking sampler over a ScoreNet."""

    def __init__(self, net, r3: R3Diffuser, so3: SO3Diffuser, cfg: SamplerConfig):
        self.net = net
        self.r3 = r3
        self.so3 = so3
        self.cfg = cfg

    def _schedule(self):
        cfg = self.cfg
        ts = jnp.linspace(1.0, cfg.eps, cfg.num_steps)
        dt = ts[0] - ts[1]
        if cfg.noise_annealing:
            tr_ns = ts
            rot_ns = ts
        else:
            tr_ns = jnp.full_like(ts, cfg.tr_noise_scale).at[-1].set(0.0)
            rot_ns = jnp.full_like(ts, cfg.rot_noise_scale).at[-1].set(0.0)
        return ts, dt, tr_ns, rot_ns

    def sample_one(
        self, params, batch, key, record_trajectory: bool = False, init=None
    ):
        """Run one pose end-to-end (randomize -> num_steps reverse SDE ->
        final re-evaluation). Pure; jit/vmap-safe.

        init: optional (pos0 [N,3,3], tr_update [1,3], rot_update [1,3]) to
        start from a given pose instead of randomizing (resume / parity).

        Returns dict: pos [N,3,3], tr_update [1,3], rot_update [1,3],
        energy, num_clashes, tr_score, rot_score (+ trajectory [T,N,3,3])."""
        cfg = self.cfg
        if cfg.integrator == "heun":
            assert cfg.ode, "the Heun integrator runs on the probability-flow ODE"
        ts, dt, tr_ns_all, rot_ns_all = self._schedule()

        # hoist the static node embedding out of the scan (and, under vmap,
        # out of the pose axis: it has no batched inputs, so it is computed
        # once per complex instead of num_steps x num_poses times)
        if "h0" not in batch and hasattr(self.net, "embed_nodes"):
            batch = dict(batch)
            batch["h0"] = self.net.embed_nodes(params, batch["x"])

        k_init, k_loop = jax.random.split(key)
        if init is None:
            pos0, tr_update, rot_update = randomize_pose(
                k_init, batch["pos"], batch["lig_mask"], batch["node_mask"], cfg
            )
        else:
            pos0, tr_update, rot_update = init

        def step(carry, inp):
            pos, tr_u, rot_u = carry
            t, tr_ns, rot_ns, k = inp
            k_net, k_rot, k_tr = jax.random.split(k, 3)

            b = dict(batch)
            b["pos"] = pos
            b["t"] = t
            # intermediate steps consume only tr/rot scores: the energy/ires/
            # clash heads run once, in the final re-evaluation below
            out = self.net.apply(params, b, k_net, predict=True, scores_only=True)

            def updates(o, tt, kr, kt):
                rot = (
                    self.so3.reverse_step(
                        kr, o["rot_score"], tt, dt, noise_scale=rot_ns, ode=cfg.ode
                    )
                    if cfg.perturb_rot
                    else jnp.zeros((1, 3))
                )
                tr = (
                    self.r3.reverse_step(
                        kt, o["tr_score"], tt, dt, noise_scale=tr_ns, ode=cfg.ode
                    )
                    if cfg.perturb_tr
                    else jnp.zeros((1, 3))
                )
                return rot, tr

            rot, tr = updates(out, t, k_rot, k_tr)

            if cfg.integrator == "heun":
                # 2nd-order Heun on the probability-flow ODE: corrector drift
                # from the Euler-predicted pose at t - dt, increments averaged
                # in the tangent space (axis-angle increments are small)
                t2 = jnp.maximum(t - dt, cfg.eps)
                b2 = dict(batch)
                b2["pos"] = modify_coords(
                    pos, batch["lig_mask"], rot, tr, cfg.center_mode
                )
                b2["t"] = t2
                out2 = self.net.apply(
                    params, b2, jax.random.fold_in(k_net, 1),
                    predict=True, scores_only=True,
                )
                rot2, tr2 = updates(out2, t2, k_rot, k_tr)
                rot = 0.5 * (rot + rot2)
                tr = 0.5 * (tr + tr2)

            pos = modify_coords(pos, batch["lig_mask"], rot, tr, cfg.center_mode)
            tr_u = tr_u + tr
            rot_u = compose_axis_angle(rot_u, rot)

            if cfg.use_clash_force:
                force = clash_force(pos, batch["lig_mask"], batch["node_mask"])
                pos = jnp.where(
                    batch["lig_mask"][:, None, None] > 0, pos + force, pos
                )
                tr_u = tr_u + force[None]

            y = pos if record_trajectory else None
            return (pos, tr_u, rot_u), y

        keys = jax.random.split(k_loop, cfg.num_steps)
        (pos, tr_update, rot_update), traj = jax.lax.scan(
            step, (pos0, tr_update, rot_update), (ts, tr_ns_all, rot_ns_all, keys)
        )

        # final re-evaluation at the terminal pose (inference_base.py:463-466)
        b = dict(batch)
        b["pos"] = pos
        b["t"] = ts[-1]
        out = self.net.apply(params, b, jax.random.fold_in(k_loop, 1), predict=True)

        result = {
            "pos": pos,
            "tr_update": tr_update,
            "rot_update": rot_update,
            "energy": out["energy"],
            "num_clashes": out["num_clashes"],
            "tr_score": out["tr_score"],
            "rot_score": out["rot_score"],
        }
        if record_trajectory:
            result["trajectory"] = traj
        return result

    def sample(self, params, batch, key, num_samples: int):
        """vmap over independent poses (replaces the reference's sequential
        120-sample loop, inference_base.py:644)."""
        keys = jax.random.split(key, num_samples)
        return jax.vmap(lambda k: self.sample_one(params, batch, k))(keys)

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def sample_jit(self, params, batch, key, num_samples: int):
        return self.sample(params, batch, key, num_samples)

    @staticmethod
    def rank_by_energy(results):
        """Index of the minimum-energy pose (inference_base.py:653-657)."""
        return jnp.argmin(results["energy"])
