"""Device-resident pool training path (train/pool.py + cli/train default)."""
import jax
import jax.numpy as jnp
import numpy as np

from dfmdock_tpu.config import DFMDockConfig, ExperimentConfig, ModelConfig
from dfmdock_tpu.data.dataset import NPZDataset
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.train import make_optimizer
from dfmdock_tpu.train.losses import loss_fn
from dfmdock_tpu.train.pool import build_pool, make_epoch_runner, rotate_batch

SMALL = ModelConfig(
    lm_embed_dim=21, node_dim=16, edge_dim=8, inner_dim=8, depth=2, dropout=0.0
)


def _setup(crop=64, variants=2, n_complexes=3):
    ds = NPZDataset("data/db5_npz")
    rng = np.random.RandomState(0)
    pool_np = build_pool(
        ds, list(range(n_complexes)), crop, crop, rng, variants=variants,
        use_esm=False,
    )
    cfg = DFMDockConfig(model=SMALL, experiment=ExperimentConfig())
    net = ScoreNet(cfg.model)
    r3 = R3Diffuser(cfg.diffuser.r3)
    so3 = SO3Diffuser(cfg.diffuser.so3)
    return net, r3, so3, cfg, pool_np


def test_pool_shapes_and_determinism():
    net, r3, so3, cfg, pool_np = _setup()
    assert pool_np["x"].shape == (6, 64, 21)
    assert pool_np["pos"].shape == (6, 64, 3, 3)
    # every pool row keeps at least a few residues of each chain after crop
    lig = pool_np["lig_mask"] * pool_np["node_mask"]
    rec = (1 - pool_np["lig_mask"]) * pool_np["node_mask"]
    assert (lig.sum(1) >= 3).all() and (rec.sum(1) >= 3).all()
    # homodimer flag carried per row (docking_dataset.py:128-140); DB5 test
    # complexes are all heterodimers, and the flag is swap-invariant
    assert pool_np["is_homomer"].shape == (6,)
    assert (pool_np["is_homomer"] == 0.0).all()


def test_is_homomer_flag():
    from dfmdock_tpu.data.dataset import complex_to_batch

    ds = NPZDataset("data/db5_npz")
    raw = ds.load_raw(0)
    assert complex_to_batch(raw, use_esm=False)["is_homomer"] == 0.0
    homo = dict(raw, lig_seq=raw["rec_seq"], lig_x=raw["rec_x"],
                lig_pos=raw["rec_pos"])
    assert complex_to_batch(homo, use_esm=False)["is_homomer"] == 1.0


def test_epoch_runner_trains_and_is_seeded():
    net, r3, so3, cfg, pool_np = _setup()
    pool = {k: jnp.asarray(v) for k, v in pool_np.items()}
    params = net.init(jax.random.PRNGKey(0))
    opt = make_optimizer(params, cfg.experiment)
    run = make_epoch_runner(net, r3, so3, cfg.experiment, opt, loss_fn)

    p0 = jax.tree.map(lambda a: np.asarray(a).copy(), params)

    def one(seed):
        p = jax.tree.map(jnp.asarray, p0)
        s = opt.init(p)
        p, s, m = run(p, s, pool, jax.random.PRNGKey(seed))
        return p, {k: np.asarray(v) for k, v in m.items()}

    p1, m1 = one(7)
    p2, m2 = one(7)

    # finite per-step metrics for the whole epoch (B = 6 steps)
    assert m1["loss"].shape == (6,)
    assert np.isfinite(m1["loss"]).all()
    # params actually moved
    delta = max(
        float(np.abs(np.asarray(a) - b).max())
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p0))
    )
    assert delta > 0
    # same seed -> identical trajectory
    np.testing.assert_array_equal(m1["loss"], m2["loss"])
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rotate_batch_preserves_geometry():
    net, r3, so3, cfg, pool_np = _setup()
    batch = {k: jnp.asarray(v[0]) for k, v in pool_np.items()}
    rot = rotate_batch(batch, jax.random.PRNGKey(3))
    v = np.asarray(batch["node_mask"]).astype(bool)
    # pairwise CA distances among valid rows are invariant
    ca0 = np.asarray(batch["pos"])[v, 1]
    ca1 = np.asarray(rot["pos"])[v, 1]
    d0 = np.linalg.norm(ca0[:, None] - ca0[None], axis=-1)
    d1 = np.linalg.norm(ca1[:, None] - ca1[None], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-3)
    # padded rows stay zero
    assert (np.asarray(rot["pos"])[~v] == 0).all()
    # it is actually a different orientation
    assert np.abs(ca0 - ca1).max() > 1.0


def test_cli_train_pool_smoke(tmp_path):
    """The CLI pool path end-to-end on CPU (tiny model via monkeypatched cfg
    is overkill — just run 1 epoch of the real config on 2 complexes with
    crop 64 and check the checkpoint lands)."""
    import dfmdock_tpu.cli.train as cli_train

    out = tmp_path / "run"
    cli_train.main([
        "--data-dir", "data/db5_npz", "--epochs", "1", "--crop-size", "64",
        "--pool-variants", "1", "--ckpt-dir", str(out), "--log-every", "1",
        "--exclude-ids", ",".join(NPZDataset("data/db5_npz").ids[2:]),
    ])
    assert (out / "last").exists()


def test_epoch_runner_batched_matches_semantics():
    """batch_size>1: runs, trains (loss finite), steps/epoch = rows/bs."""
    net, r3, so3, cfg, pool_np = _setup()  # 6 pool rows
    pool = {k: jnp.asarray(v) for k, v in pool_np.items()}
    params = net.init(jax.random.PRNGKey(0))
    opt = make_optimizer(params, cfg.experiment)
    run_b2 = make_epoch_runner(net, r3, so3, cfg.experiment, opt, loss_fn,
                               batch_size=2)
    p0 = jax.tree.map(lambda a: np.asarray(a).copy(), params)  # donated below
    p, s, m = run_b2(params, opt.init(params), pool, jax.random.PRNGKey(3))
    n_steps = len(np.asarray(m["loss"]))
    assert n_steps == 3  # 6 rows / batch 2
    assert np.isfinite(np.asarray(m["loss"])).all()
    # params moved
    delta = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p))
    )
    assert delta > 0


def test_epoch_runner_dp_matches_single_device():
    """dp-sharded pool epoch == unsharded epoch (same seeds -> same params):
    the VERDICT r2 'compose dp with the pool path' deliverable."""
    from dfmdock_tpu.parallel.mesh import make_mesh

    net, r3, so3, cfg, pool_np = _setup(n_complexes=4)  # 8 pool rows
    pool = {k: jnp.asarray(v) for k, v in pool_np.items()}
    params0 = jax.tree.map(
        lambda a: np.asarray(a).copy(), net.init(jax.random.PRNGKey(0))
    )
    opt = make_optimizer(params0, cfg.experiment)
    mesh = make_mesh(8)

    def run(mesh_arg):
        p = jax.tree.map(jnp.asarray, params0)  # fresh buffers (donated)
        runner = make_epoch_runner(net, r3, so3, cfg.experiment, opt, loss_fn,
                                   batch_size=8, mesh=mesh_arg)
        p, s, m = runner(p, opt.init(p), pool, jax.random.PRNGKey(11))
        return (jax.tree.map(np.asarray, p),
                {k: np.asarray(v) for k, v in m.items()})

    p_dp, m_dp = run(mesh)
    p_1d, m_1d = run(None)
    np.testing.assert_allclose(m_dp["loss"], m_1d["loss"], rtol=1e-4)
    # grad psum vs single-device vmap-mean differ only in fp reduction order;
    # AdamW's 1/sqrt(v) normalization amplifies that for near-zero grads, so
    # compare with an absolute tolerance ~1e-3 of typical weight scale
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_1d)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-5)


def test_dispatch_chunk_stays_constant_for_aligned_boundaries():
    """One chunk size == one executable (NOTES.md round 3: the axon tunnel
    pays a multi-minute first-run stall per distinct size, and >~60 s
    dispatches crash the worker) — aligned boundaries must yield a single
    constant chunk, and misaligned ones must clip at the right epochs."""
    from dfmdock_tpu.cli.train import dispatch_chunk

    def chunks(epochs, per_call, refresh, save):
        out, e = [], 0
        while e < epochs:
            c = dispatch_chunk(e, epochs, per_call, refresh, save)
            assert c > 0
            out.append(c)
            e += c
        return out

    # the CV-fold config: all boundaries multiples of 10 -> constant
    assert set(chunks(2000, 10, 200, 500)) == {10}
    # no boundaries at all
    assert set(chunks(100, 10, 0, 0)) == {10}
    # misaligned refresh clips at the refresh boundary (and only there)
    assert chunks(50, 20, 25, 0) == [20, 5, 20, 5]
    # save boundary clips the same way
    assert chunks(30, 10, 0, 15) == [10, 5, 10, 5]
    # tail shorter than per_call
    assert chunks(25, 10, 0, 0) == [10, 10, 5]
