"""Parallel-in-time (Picard) probability-flow ODE sampler.

The sequential reverse loop runs T=num_steps score evaluations one after
another — latency T * t_eval per pose even when the chip is idle.  Picard
iteration instead keeps a whole trajectory estimate {x_i} and repeats:

  1. evaluate ALL T drifts in parallel:  (rot_i, tr_i) = ode_update(x_i, t_i)
  2. recompose the trajectory sequentially from the fixed initial pose:
     x_{i+1} = modify_coords(x_i, rot_i, tr_i)   (cheap — no network)

The fixed point of this map IS the sequential ODE trajectory (same per-step
edge-sampling keys), so K converged iterations replace T sequential steps:
latency drops from T to K score-eval rounds, paid for with T-fold batch
parallelism per round — exactly the trade a TPU with spare capacity wants.
(PAPERS.md: "Parallel Sampling of Diffusion Models"-style; no reference
counterpart — inference_base.py's loop is strictly sequential.)

ODE mode only: the SDE's per-step noise makes the fixed point equal the
sequential SDE path too (noise is state-independent), but the EM sampler's
best-of-N diversity argument favors plain vmap over poses when throughput,
not latency, is the goal — see ckpts/db5_holdout/README.md.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dfmdock_tpu.config import SamplerConfig
from dfmdock_tpu.geom import compose_axis_angle
from dfmdock_tpu.sampler.em import EMSampler, modify_coords, randomize_pose


class PicardSampler:
    """Drop-in latency-mode alternative to EMSampler (ODE only)."""

    def __init__(self, net, r3, so3, cfg: SamplerConfig, num_iters: int = 10):
        assert cfg.ode, "Picard iteration applies to the probability-flow ODE"
        assert not cfg.use_clash_force, "clash force not supported in Picard mode"
        assert cfg.integrator == "em", (
            "Picard is its own integration scheme; combine it with the plain "
            "Euler drift (integrator='em'), not heun"
        )
        self.net = net
        self.r3 = r3
        self.so3 = so3
        self.cfg = cfg
        self.num_iters = num_iters
        self._em = EMSampler(net, r3, so3, cfg)

    def sample_one(self, params, batch, key, init=None):
        cfg = self.cfg
        ts, dt, _, _ = self._em._schedule()
        T = cfg.num_steps

        if "h0" not in batch and hasattr(self.net, "embed_nodes"):
            batch = dict(batch)
            batch["h0"] = self.net.embed_nodes(params, batch["x"])

        k_init, k_loop = jax.random.split(key)
        if init is None:
            pos0, tr0, rot0 = randomize_pose(
                k_init, batch["pos"], batch["lig_mask"], batch["node_mask"], cfg
            )
        else:
            pos0, tr0, rot0 = init

        # the same per-step keys the sequential EM sampler derives, so the
        # stochastic edge subsampling matches step-for-step and the fixed
        # point is exactly the sequential trajectory
        step_keys = jax.random.split(k_loop, T)
        net_keys = jax.vmap(lambda k: jax.random.split(k, 3)[0])(step_keys)

        lig_mask = batch["lig_mask"]

        def drift(pos_i, t_i, k_i):
            b = dict(batch)
            b["pos"] = pos_i
            b["t"] = t_i
            out = self.net.apply(params, b, k_i, predict=True, scores_only=True)
            # honor the perturb switches exactly like EMSampler (em.py:169-181)
            rot = (
                self.so3.reverse_step(k_i, out["rot_score"], t_i, dt, ode=True)
                if cfg.perturb_rot
                else jnp.zeros((1, 3))
            )
            tr = (
                self.r3.reverse_step(k_i, out["tr_score"], t_i, dt, ode=True)
                if cfg.perturb_tr
                else jnp.zeros((1, 3))
            )
            return rot, tr

        def recompose(rots, trs):
            def body(pos, upd):
                new = modify_coords(pos, lig_mask, upd[0], upd[1], cfg.center_mode)
                return new, new

            _, traj = jax.lax.scan(body, pos0, (rots, trs))
            return traj  # traj[i] = pose AFTER step i

        def picard_iter(states, _):
            # states[i] = current estimate of the pose BEFORE step i
            rots, trs = jax.vmap(drift)(states, ts, net_keys)
            traj = recompose(rots, trs)
            new_states = jnp.concatenate([pos0[None], traj[:-1]], axis=0)
            return new_states, (traj[-1], rots, trs)

        states0 = jnp.broadcast_to(pos0[None], (T,) + pos0.shape)
        _, (finals, rots, trs) = jax.lax.scan(
            picard_iter, states0, None, length=self.num_iters
        )
        pos = finals[-1]

        # accumulate the final iterate's updates like the sequential sampler
        tr_update = tr0 + trs[-1].sum(0)

        def comp(acc, r):
            return compose_axis_angle(acc, r), None

        rot_update, _ = jax.lax.scan(comp, rot0, rots[-1])

        b = dict(batch)
        b["pos"] = pos
        b["t"] = ts[-1]
        out = self.net.apply(params, b, jax.random.fold_in(k_loop, 1), predict=True)
        return {
            "pos": pos,
            "tr_update": tr_update,
            "rot_update": rot_update,
            "energy": out["energy"],
            "num_clashes": out["num_clashes"],
            "tr_score": out["tr_score"],
            "rot_score": out["rot_score"],
        }

    def sample(self, params, batch, key, num_samples: int):
        keys = jax.random.split(key, num_samples)
        return jax.vmap(lambda k: self.sample_one(params, batch, k))(keys)
