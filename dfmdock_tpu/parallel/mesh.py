"""Multi-chip scaling via jax.sharding.Mesh + jit shardings.

The reference has no distributed execution at all (single device,
batch_size=1, sequential loops — SURVEY.md §2).  Here scaling is first-class:

- inference: candidate poses are embarrassingly parallel -> shard the pose
  axis over the mesh ('dp'); params and the complex batch are replicated.
  Collectives: none in the hot loop (poses never communicate) — exactly the
  right amount of ICI traffic.
- training: data parallelism over complexes; jit + shardings make XLA insert
  the psum for the gradient all-reduce over ICI.

Both builders return functions already jitted with explicit shardings, ready
for any mesh shape (real multi-chip or the CPU-virtual-device harness).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dfmdock_tpu.train.losses import loss_fn


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    mesh_devs = mesh_utils.create_device_mesh((n_devices,), devices=devs[:n_devices])
    return Mesh(mesh_devs, (axis,))


def make_pose_parallel_sampler(sampler, mesh: Mesh, num_samples: int):
    """Shard `num_samples` independent poses over the mesh's dp axis.

    Returns fn(params, batch, key) -> results with leading pose axis sharded.
    """
    repl = NamedSharding(mesh, P())
    pose_sharded = NamedSharding(mesh, P("dp"))

    def run(params, batch, keys):
        return jax.vmap(lambda k: sampler.sample_one(params, batch, k))(keys)

    run_jit = jax.jit(
        run,
        in_shardings=(repl, repl, pose_sharded),
        out_shardings=pose_sharded,
    )

    def fn(params, batch, key):
        keys = jax.device_put(
            jax.random.split(key, num_samples), pose_sharded
        )
        return run_jit(params, batch, keys)

    return fn


def make_dp_train_step(net, r3, so3, exp, opt, mesh: Mesh):
    """Data-parallel training step over a stacked batch of complexes.

    The batch dict's leaves have a leading complex axis sharded over 'dp';
    params/opt_state are replicated.  Grad all-reduce is inserted by XLA.
    """
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))

    def step(params, opt_state, batch, keys):
        def mean_loss(p):
            losses, metrics = jax.vmap(
                lambda b, k: loss_fn(p, net, r3, so3, b, k, exp)
            )(batch, keys)
            return losses.mean(), jax.tree.map(jnp.mean, metrics)

        (_, metrics), grads = jax.value_and_grad(mean_loss, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    step_jit = jax.jit(
        step,
        in_shardings=(repl, repl, dp, dp),
        out_shardings=(repl, repl, repl),
    )

    def fn(params, opt_state, batch, key):
        n = jax.tree_util.tree_leaves(batch)[0].shape[0]
        keys = jax.device_put(jax.random.split(key, n), dp)
        batch = jax.device_put(batch, dp)
        return step_jit(params, opt_state, batch, keys)

    return fn


def stack_batches(batches: list[dict]) -> dict:
    """Stack same-shape padded complex batches along a new leading axis."""
    keys = [k for k in batches[0] if not isinstance(batches[0][k], str)]
    return {k: np.stack([np.asarray(b[k]) for b in batches]) for k in keys}
